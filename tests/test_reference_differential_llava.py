"""Differential tests: the ACTUAL reference LLaVA instruct datasets vs
``data/llava.py``.

``util/llava_instruct_data.py`` (AlignDataset :25-119, FinetuneDataset
:122-244) imports ``models.cobra.backbones.vision`` only for the
``ImageTransform`` Protocol annotation — the vision package itself needs
timm (absent in-image), so a stub module is installed in ``sys.modules``
before the import; none of the dataset logic under test touches it (the
transform is injected).

The reference hard-raises on any tokenizer that is not a
``GPTNeoXTokenizerFast`` (llava_instruct_data.py:169-173), so the shared
``OfflineTokenizer`` is wrapped in a ``Mock(spec=GPTNeoXTokenizerFast)``
implementing the exact HF call surface each side uses (``return_tensors=
"pt"`` for align, ``add_special_tokens=`` for finetune — GPT-NeoX adds no
special tokens either way, matching the real tokenizer).
"""

from __future__ import annotations

import json
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not present"
)

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)

# stub the timm-dependent vision package BEFORE the reference dataset module
# imports ImageTransform from it (a Protocol — any class satisfies the name)
if "models.cobra.backbones.vision" not in sys.modules:
    _stub = types.ModuleType("models.cobra.backbones.vision")

    class _ImageTransform:  # pragma: no cover - annotation stand-in
        pass

    _stub.ImageTransform = _ImageTransform
    _stub.VisionBackbone = object
    sys.modules["models.cobra.backbones.vision"] = _stub


def t2n(x):
    return x.detach().cpu().numpy()


SIZE = 32  # tiny square images keep PIL work negligible


def _base_tokenizer():
    from omnimamba_tpu.data.tokenizer import OfflineTokenizer

    tok = OfflineTokenizer()
    tok.add_special_tokens({"pad_token": "<|pad|>"})
    return tok


def _ref_tokenizer(base):
    """HF-protocol shim around the shared OfflineTokenizer that passes the
    reference's ``isinstance(tok, GPTNeoXTokenizerFast)`` gate."""
    from types import SimpleNamespace
    from unittest.mock import Mock

    from transformers import GPTNeoXTokenizerFast

    tok = Mock(spec=GPTNeoXTokenizerFast)

    def call(text, truncation=False, return_tensors=None, add_special_tokens=True):
        ids = base.encode(text)  # GPT-NeoX adds no special tokens
        if return_tensors == "pt":
            return SimpleNamespace(
                input_ids=torch.tensor([ids], dtype=torch.long)
            )
        return SimpleNamespace(input_ids=list(ids))

    tok.side_effect = call
    tok.eos_token = base.eos_token
    tok.pad_token_id = base.pad_token_id
    return tok


class _RefTransform:
    """Injected reference-side transform producing byte-identical pixels to
    data/llava._load_image_uint8 (RGB convert happens in the dataset; the
    default PIL resample matches because both sides call plain .resize)."""

    def __call__(self, img):
        return np.asarray(img.resize((SIZE, SIZE)), np.uint8)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """Images exercising every arm of the loader: two good JPEGs, a
    jpg→gif fallback (llava_instruct_data.py:101-104), and a corrupt file
    with no fallback (→ pixel_values=None on both sides)."""
    from PIL import Image

    d = tmp_path_factory.mktemp("llava_diff")
    rng = np.random.default_rng(0)
    for i in (0, 1):
        arr = rng.integers(0, 255, (48, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.jpg")
    # row 2: img_2.jpg missing, img_2.gif present
    arr = rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
    Image.fromarray(arr).convert("P").save(d / "img_2.gif")
    # row 3: corrupt jpg, no gif
    (d / "img_3.jpg").write_bytes(b"not an image at all")

    align_rows = [
        {
            "image": f"img_{i}.jpg",
            "conversations": [
                {"from": "human", "value": "Give a short caption.\n<image>"},
                {"from": "gpt", "value": f"  caption row {i} with words {i * 3}  "},
            ],
        }
        for i in range(4)
    ]
    with open(d / "align.json", "w") as f:
        json.dump(align_rows, f)

    long_turn = " ".join(f"w{k}" for k in range(40))
    finetune_rows = [
        {
            "image": f"img_{i}.jpg",
            "conversations": [
                {"from": "human", "value": f"<image>\nWhat is in picture {i}?"},
                {"from": "gpt", "value": f"A synthetic object number {i}."},
                {"from": "human", "value": "Describe its color."},
                {"from": "gpt", "value": "It is a bright test-pattern color."},
            ],
        }
        for i in range(4)
    ]
    # truncation break: the long second turn overflows max_length-1 mid-loop
    finetune_rows.append(
        {
            "image": "img_0.jpg",
            "conversations": [
                {"from": "human", "value": "<image>\nTell me everything."},
                {"from": "gpt", "value": long_turn},
                {"from": "human", "value": "More."},
                {"from": "gpt", "value": "Done."},
            ],
        }
    )
    # text-only row: the reference filters it out (:145); ours must too
    finetune_rows.append(
        {
            "conversations": [
                {"from": "human", "value": "No image here."},
                {"from": "gpt", "value": "Indeed."},
            ]
        }
    )
    with open(d / "finetune.json", "w") as f:
        json.dump(finetune_rows, f)
    return d


def _pairs_align(data_dir, max_length=24):
    import util.llava_instruct_data as ref_llava

    from omnimamba_tpu.data.llava import AlignDataset as MyAlign

    base = _base_tokenizer()
    ref = ref_llava.AlignDataset(
        data_dir / "align.json", data_dir, _RefTransform(),
        _ref_tokenizer(base), max_length=max_length,
    )
    mine = MyAlign(
        str(data_dir / "align.json"), str(data_dir), base,
        max_length=max_length, image_size=SIZE,
    )
    return ref, mine


def _pairs_finetune(data_dir, max_length=32, eot_id=3):
    import util.llava_instruct_data as ref_llava
    from models.cobra.backbones.llm.prompting.mamba_prompter import (
        MambaPromptBuilder as RefPB,
    )

    from omnimamba_tpu.data.llava import FinetuneDataset as MyFinetune
    from omnimamba_tpu.data.prompt_builder import MambaPromptBuilder as MyPB

    base = _base_tokenizer()
    ref = ref_llava.FinetuneDataset(
        data_dir / "finetune.json", data_dir, _RefTransform(),
        _ref_tokenizer(base), prompt_builder_fn=RefPB,
        max_length=max_length, eot_id=eot_id,
    )
    mine = MyFinetune(
        str(data_dir / "finetune.json"), str(data_dir), base,
        prompt_builder_fn=MyPB, max_length=max_length, eot_id=eot_id,
        image_size=SIZE,
    )
    return ref, mine


class TestAlignDifferential:
    def test_items(self, data_dir):
        ref, mine = _pairs_align(data_dir)
        assert len(ref) == len(mine) == 4
        for i in range(4):
            r, m = ref[i], mine[i]
            np.testing.assert_array_equal(m["input_ids"], t2n(r["input_ids"]))
            np.testing.assert_array_equal(m["labels"], t2n(r["labels"]))
            if r["pixel_values"] is None:
                assert m["pixel_values"] is None and i == 3
            else:
                np.testing.assert_array_equal(
                    m["pixel_values"], np.asarray(r["pixel_values"])
                )

    def test_truncation(self, data_dir):
        """Caption longer than max_length is right-truncated identically."""
        ref, mine = _pairs_align(data_dir, max_length=3)
        r, m = ref[0], mine[0]
        np.testing.assert_array_equal(m["input_ids"], t2n(r["input_ids"]))
        np.testing.assert_array_equal(m["labels"], t2n(r["labels"]))
        assert len(m["input_ids"]) == 3

    def test_modality_lengths(self, data_dir):
        ref, mine = _pairs_align(data_dir)
        assert mine.get_modality_lengths(729) == ref.get_modality_lengths(729)


class TestFinetuneDifferential:
    def test_filters_text_only_rows(self, data_dir):
        ref, mine = _pairs_finetune(data_dir)
        assert len(ref) == len(mine) == 5  # 6 rows, one text-only dropped

    def test_items(self, data_dir):
        ref, mine = _pairs_finetune(data_dir)
        for i in range(len(ref)):
            r, m = ref[i], mine[i]
            np.testing.assert_array_equal(
                m["input_ids"], t2n(r["input_ids"]), err_msg=f"row {i}"
            )
            np.testing.assert_array_equal(
                m["labels"], t2n(r["labels"]), err_msg=f"row {i}"
            )
            if r["pixel_values"] is None:
                assert m["pixel_values"] is None
            else:
                np.testing.assert_array_equal(
                    m["pixel_values"], np.asarray(r["pixel_values"])
                )

    def test_truncation_break_drops_whole_turn(self, data_dir):
        """Row 4's 40-token gpt turn overflows max_length-1, so BOTH sides
        stop before it: only the first human turn + <eot> survive, and every
        kept label is IGNORE (llava_instruct_data.py:178-180,197)."""
        ref, mine = _pairs_finetune(data_dir)
        r, m = ref[4], mine[4]
        np.testing.assert_array_equal(m["input_ids"], t2n(r["input_ids"]))
        np.testing.assert_array_equal(m["labels"], t2n(r["labels"]))
        assert (m["labels"] == -100).all()

    def test_modality_lengths(self, data_dir):
        ref, mine = _pairs_finetune(data_dir)
        assert mine.get_modality_lengths() == ref.get_modality_lengths()
