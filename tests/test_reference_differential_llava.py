"""Differential tests of the MMU datasets against the ACTUAL reference
``util/llava_instruct_data.py`` (r5 extension of test_reference_differential).

The reference module imports the cobra vision package (timm + torchvision at
module top) and type-gates its tokenizer handling on ``GPTNeoXTokenizerFast``.
Neither timm nor torchvision is installed here, and both are irrelevant to
the DATA CONTRACT under test (ids/labels packing), so this file installs
minimal import-surface stubs for them and builds a real GPTNeoXTokenizerFast
from the in-repo mini BPE fixture. The image transform is a constant-tensor
lambda on the reference side; pixel comparisons are out of scope (covered by
test_transforms / the PARITY dossier) — ids, labels, padding, truncation,
eot handling, and the corrupt-image fallback are in scope.
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


def _install_vision_stubs():
    """timm / torchvision import-surface stubs — only what the reference
    vision package touches at import time."""
    if "timm" in sys.modules and not getattr(sys.modules["timm"], "__stub__", False):
        return  # a real timm exists; don't shadow it
    timm = types.ModuleType("timm")
    timm.__stub__ = True
    timm_models = types.ModuleType("timm.models")
    timm_vt = types.ModuleType("timm.models.vision_transformer")

    class _Dummy:  # isinstance targets only
        pass

    timm_vt.Block = _Dummy
    timm_vt.VisionTransformer = _Dummy
    timm_data = types.ModuleType("timm.data")
    timm.models = timm_models
    timm.data = timm_data
    timm_models.vision_transformer = timm_vt
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.vision_transformer", timm_vt)
    sys.modules.setdefault("timm.data", timm_data)

    tv = types.ModuleType("torchvision")
    tv.__stub__ = True
    tv_tr = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class Resize:
        def __init__(self, *a, **k):
            pass

    tv_tr.Compose = Compose
    tv_tr.Resize = Resize
    tv_f = types.ModuleType("torchvision.transforms.functional")
    tv.transforms = tv_tr
    tv_tr.functional = tv_f
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv_tr)
    sys.modules.setdefault("torchvision.transforms.functional", tv_f)


@pytest.fixture(scope="module")
def neox_tokenizer(tmp_path_factory):
    from tokenizers import Tokenizer
    from tokenizers.decoders import ByteLevel as ByteLevelDecoder
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel
    from transformers import GPTNeoXTokenizerFast

    fx = os.path.join(os.path.dirname(__file__), "fixtures", "mini_bpe")
    tok = Tokenizer(
        BPE.from_file(
            os.path.join(fx, "vocab.json"), os.path.join(fx, "merges.txt")
        )
    )
    tok.pre_tokenizer = ByteLevel(add_prefix_space=False)
    tok.decoder = ByteLevelDecoder()
    path = str(tmp_path_factory.mktemp("tok") / "tokenizer.json")
    tok.save(path)
    t = GPTNeoXTokenizerFast(tokenizer_file=path, eos_token="<|endoftext|>")
    t.add_special_tokens({"pad_token": "[PAD]"})
    return t


@pytest.fixture(scope="module")
def ref_mod():
    _install_vision_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from util import llava_instruct_data

    return llava_instruct_data


def _write_image(path):
    from PIL import Image

    Image.fromarray(
        (np.random.default_rng(0).random((20, 24, 3)) * 255).astype(np.uint8)
    ).save(path)


ALIGN_ROWS = [
    {
        "image": "a.jpg",
        "conversations": [
            {"from": "human", "value": "Summarize the photo.\n<image>"},
            {"from": "gpt", "value": "  a cat sits on a mat  "},
        ],
    },
    {
        "image": "missing.jpg",  # corrupt-image fallback -> pixel None
        "conversations": [
            {"from": "human", "value": "<image>"},
            {"from": "gpt", "value": "one two three four five six seven eight "
                                     * 40},  # truncation arm
        ],
    },
]

INSTRUCT_ROWS = [
    {
        "image": "a.jpg",
        "conversations": [
            {"from": "human", "value": "What is in this <image> photo?"},
            {"from": "gpt", "value": "A cat."},
            {"from": "human", "value": "What color?"},
            {"from": "gpt", "value": "Orange."},
        ],
    },
    {
        "image": "a.jpg",
        "conversations": [
            {"from": "human", "value": "Describe <image> at length."},
            {"from": "gpt", "value": "word " * 600},  # turn-overflow break arm
        ],
    },
]


def test_align_dataset_matches(tmp_path, neox_tokenizer, ref_mod):
    _write_image(tmp_path / "a.jpg")
    chat = tmp_path / "chat.json"
    chat.write_text(json.dumps(ALIGN_ROWS))

    from omnimamba_tpu.data.llava import AlignDataset as MyAlign

    max_len = 48
    ref_ds = ref_mod.AlignDataset(
        chat, tmp_path, lambda img: torch.zeros(1), neox_tokenizer,
        max_length=max_len,
    )
    my_ds = MyAlign(str(chat), str(tmp_path), neox_tokenizer, max_length=max_len)
    assert len(ref_ds) == len(my_ds)
    for i in range(len(ref_ds)):
        r, m = ref_ds[i], my_ds[i]
        np.testing.assert_array_equal(m["input_ids"], r["input_ids"].numpy())
        np.testing.assert_array_equal(m["labels"], r["labels"].numpy())
        assert (m["pixel_values"] is None) == (r["pixel_values"] is None)


def test_finetune_dataset_matches(tmp_path, neox_tokenizer, ref_mod):
    _write_image(tmp_path / "a.jpg")
    instruct = tmp_path / "instruct.json"
    instruct.write_text(json.dumps(INSTRUCT_ROWS))

    from omnimamba_tpu.data.llava import FinetuneDataset as MyFinetune
    from omnimamba_tpu.data.prompt_builder import MambaPromptBuilder as MyPB

    from models.cobra.backbones.llm.prompting.mamba_prompter import (
        MambaPromptBuilder as RefPB,
    )

    max_len, eot = 64, 333
    ref_ds = ref_mod.FinetuneDataset(
        instruct, tmp_path, lambda img: torch.zeros(1), neox_tokenizer,
        prompt_builder_fn=RefPB, max_length=max_len, eot_id=eot,
    )
    my_ds = MyFinetune(
        str(instruct), str(tmp_path), neox_tokenizer,
        prompt_builder_fn=MyPB, max_length=max_len, eot_id=eot,
    )
    assert len(ref_ds) == len(my_ds)
    for i in range(len(ref_ds)):
        r, m = ref_ds[i], my_ds[i]
        np.testing.assert_array_equal(m["input_ids"], r["input_ids"].numpy())
        np.testing.assert_array_equal(m["labels"], r["labels"].numpy())
