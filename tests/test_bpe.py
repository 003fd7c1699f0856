"""Byte-level BPE engine tests (VERDICT round-1 item 5).

The fixture under tests/fixtures/mini_bpe is a real (tiny) byte-level BPE:
256 byte symbols + 80 merges + <|endoftext|>, trained offline with
omnimamba_tpu.data.bpe.train_bpe. Parity is checked against HF's pure-Python
GPT2Tokenizer loaded from the *same* files (same algorithm family as
gpt-neox-20b's ByteLevel BPE) — no network needed. A full gpt-neox-20b
equality test runs only if real tokenizer files are present locally.
"""

import os

import pytest

from omnimamba_tpu.data.bpe import ByteLevelBPETokenizer, bytes_to_unicode
from omnimamba_tpu.data.tokenizer import add_omnimamba_tokens

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini_bpe")

SAMPLES = [
    "A photo of a cat sitting on a wooden table.",
    "The quick brown fox jumps over the lazy dog.",
    "USER: What is shown in the image? ASSISTANT: A dog and a cat.",
    "unseen words zyxwvut qqq --- ///",
    "naïve café — über-cool emoji test 🙂 done",
    "   leading and   multiple   spaces\t tabs\nnewlines  ",
    "numbers 12345 67890 and punctuation!!! (mixed) [brackets]",
    "日本語のテキストもバイト単位で処理される",
    "contractions: don't we'll I'm you've she'd they're it's",
    "",
]


def _tok():
    return ByteLevelBPETokenizer.from_dir(FIX)


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_roundtrip_byte_exact():
    tok = _tok()
    for s in SAMPLES:
        ids = tok.encode(s)
        assert tok.decode(ids) == s, s


def test_matches_hf_gpt2_tokenizer_on_same_files():
    from transformers import GPT2Tokenizer

    hf = GPT2Tokenizer(
        vocab_file=os.path.join(FIX, "vocab.json"),
        merges_file=os.path.join(FIX, "merges.txt"),
        unk_token="<|endoftext|>",
        bos_token="<|endoftext|>",
        eos_token="<|endoftext|>",
    )
    ours = _tok()
    for s in SAMPLES:
        if not s:
            continue
        assert ours.encode(s) == hf.encode(s), s
        assert ours.decode(ours.encode(s)) == hf.decode(hf.encode(s)), s


def test_eos_atomic_in_text():
    tok = _tok()
    ids = tok.encode("hello<|endoftext|>world")
    assert tok.eos_token_id in ids
    assert tok.decode(ids) == "hello<|endoftext|>world"
    assert tok.decode(ids, skip_special_tokens=True) == "helloworld"


def test_added_tokens_and_sptids_layout():
    tok = _tok()
    base = len(tok)
    sptids = add_omnimamba_tokens(tok)
    # [PAD] first, then the 9 specials, contiguous above base vocab
    assert sptids["<|pad|>"] == base
    assert sptids["<|soi|>"] == base + 1
    assert sptids["<|lvg|>"] == base + 9
    ids = tok.encode("<|t2i|><|sot|>a cat<|eot|><|soi|>")
    assert ids[0] == sptids["<|t2i|>"]
    assert ids[1] == sptids["<|sot|>"]
    assert ids[-2] == sptids["<|eot|>"]
    assert ids[-1] == sptids["<|soi|>"]
    assert tok.decode(tok.encode("x <|mmu|> y")) == "x <|mmu|> y"


def test_call_truncation_and_batch():
    tok = _tok()
    tok.model_max_length = 4
    enc = tok("a cat sitting on a wooden table", truncation=True)
    assert len(enc["input_ids"]) == 4
    enc2 = tok(["a cat", "a dog"], truncation=False)
    assert len(enc2["input_ids"]) == 2


@pytest.mark.skipif(
    not os.environ.get("OMNIMAMBA_TOKENIZER_DIR")
    or not os.path.isdir(os.environ.get("OMNIMAMBA_TOKENIZER_DIR", "")),
    reason="real gpt-neox tokenizer files not present",
)
def test_matches_hf_gpt_neox_when_files_exist():
    from transformers import AutoTokenizer

    d = os.environ["OMNIMAMBA_TOKENIZER_DIR"]
    hf = AutoTokenizer.from_pretrained(d, local_files_only=True)
    ours = ByteLevelBPETokenizer.from_dir(d)
    assert len(ours) == len(hf)
    for s in SAMPLES:
        if not s:
            continue
        assert ours.encode(s) == hf.encode(s), s


def test_default_sptids_covers_mmu_wrap_and_default_vocab():
    """bench.py/profile_train.py build synthetic models with default_sptids();
    the mmu flow's _mmu_wrap_ids indexes these four tokens and the ids must
    sit inside the default MambaConfig's padded text vocab (r4 regression:
    sptids={} KeyError'd the stage-2 mixed measurement)."""
    from omnimamba_tpu.config import MambaConfig
    from omnimamba_tpu.data.tokenizer import (
        OfflineTokenizer,
        add_omnimamba_tokens,
        default_sptids,
    )

    sp = default_sptids()
    for tok in ("<|mmu|>", "<|soi|>", "<|eoi|>", "<|sot|>"):
        assert tok in sp
    assert max(sp.values()) < MambaConfig().padded_vocab_size
    assert sp == add_omnimamba_tokens(OfflineTokenizer())
