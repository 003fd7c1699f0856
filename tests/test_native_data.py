"""Native C++ data engine vs the pure-Python dataset."""

import numpy as np
import pytest

from omnimamba_tpu.data.coco import make_synthetic_coco_jsonl
from omnimamba_tpu.data.native import NativeCocoReader, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libomnidata.so not built"
)


def test_reader_matches_json(tmp_path):
    import json

    path = str(tmp_path / "toy.jsonl")
    make_synthetic_coco_jsonl(path, n=32, num_tokens=16)
    reader = NativeCocoReader(path)
    assert len(reader) == 32

    with open(path) as f:
        rows = [json.loads(l) for l in f]

    idx = np.array([0, 5, 31, 7], np.int64)
    tokens, captions = reader.read_batch(idx, num_tokens=16, seed=123)
    for i, r in enumerate(idx):
        np.testing.assert_array_equal(tokens[i], np.asarray(rows[r]["tokens"], np.int32))
        assert captions[i] in rows[r]["captions"]
    reader.close()


def test_reader_handles_escapes_and_multiple_captions(tmp_path):
    import json

    path = str(tmp_path / "esc.jsonl")
    rows = [
        {"captions": ['a "quoted" \\ caption', "second one"], "tokens": list(range(8))},
        {"captions": ["unicode café"], "tokens": [7] * 8},
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    reader = NativeCocoReader(path)
    tokens, captions = reader.read_batch(np.array([0, 1]), num_tokens=8, seed=0)
    np.testing.assert_array_equal(tokens[1], np.full(8, 7, np.int32))
    # raw JSON bytes are returned (escapes preserved) — decoding is a host
    # tokenizer concern; the chosen caption must be one of the row's entries
    assert captions[0] in ('a \\"quoted\\" \\\\ caption', "second one")
    reader.close()


def test_caption_choice_deterministic_per_seed(tmp_path):
    path = str(tmp_path / "det.jsonl")
    import json

    with open(path, "w") as f:
        f.write(json.dumps({"captions": ["a", "b", "c"], "tokens": [1, 2]}) + "\n")
    reader = NativeCocoReader(path)
    _, c1 = reader.read_batch(np.array([0]), num_tokens=2, seed=42)
    _, c2 = reader.read_batch(np.array([0]), num_tokens=2, seed=42)
    assert c1 == c2
    reader.close()
