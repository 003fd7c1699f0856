"""ctypes binding for the native (C++) data engine.

``native/omnidata.cpp`` mmaps the pretokenized COCO JSONL, indexes lines with
a threaded scan, and fills int32 token batches + caption bytes directly into
numpy buffers — replacing the reference's 16-process torch DataLoader JSON
path (trainer.py:62-64) with an in-process zero-copy reader. Falls back to
the pure-Python dataset when the shared library isn't built.

Build: ``make -C native`` (or this module builds it on first use if a
compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libomnidata.so")

_lib = None


def _load_lib(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_REPO_ROOT, "native")],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.od_open.argtypes = [ctypes.c_char_p]
    lib.od_open.restype = ctypes.c_void_p
    lib.od_num_rows.argtypes = [ctypes.c_void_p]
    lib.od_num_rows.restype = ctypes.c_int64
    lib.od_fill_t2i_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_uint64,
    ]
    lib.od_fill_t2i_batch.restype = ctypes.c_int
    lib.od_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeCocoReader:
    """mmap-backed random-access reader over the pretokenized JSONL."""

    CAP_STRIDE = 1024

    def __init__(self, path: str):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libomnidata.so unavailable (no compiler?)")
        self._lib = lib
        self._h = lib.od_open(path.encode())
        if not self._h:
            raise FileNotFoundError(path)

    def __len__(self) -> int:
        return int(self._lib.od_num_rows(self._h))

    def read_batch(
        self, indices: np.ndarray, num_tokens: int = 256, seed: int = 0
    ) -> Tuple[np.ndarray, List[str]]:
        """Returns (tokens (n, num_tokens) int32, captions list[str])."""
        idx = np.ascontiguousarray(indices, np.int64)
        n = len(idx)
        tokens = np.empty((n, num_tokens), np.int32)
        caps = np.zeros(n * self.CAP_STRIDE, np.uint8)
        lens = np.empty(n, np.int32)
        rc = self._lib.od_fill_t2i_batch(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            num_tokens,
            tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            caps.ctypes.data_as(ctypes.c_char_p),
            self.CAP_STRIDE,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            seed & 0xFFFFFFFFFFFFFFFF,
        )
        if rc != 0:
            raise ValueError(f"parse error at batch row {-rc - 1}")
        captions = [
            caps[i * self.CAP_STRIDE : i * self.CAP_STRIDE + lens[i]]
            .tobytes()
            .decode("utf-8", errors="replace")
            for i in range(n)
        ]
        return tokens, captions

    def close(self):
        if self._h:
            self._lib.od_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeCocoLoader:
    """DataLoader-compatible epoch iterator over the native reader:
    shuffled index batches -> zero-copy C++ batch fill -> caption-block
    packing. Drop-in for data/loader.DataLoader in the t2i flow."""

    def __init__(self, dataset: "NativeCocoDataset", batch_size: int, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def __iter__(self):
        n = len(self)
        rng = np.random.default_rng(self.seed + self.epoch)
        idx = rng.permutation(len(self.dataset))
        epoch = self.epoch
        self.epoch += 1
        for b in range(n):
            sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
            yield self.dataset.read_batch(sel, epoch=epoch)


class NativeCocoDataset:
    """Drop-in fast path for MSCOCOFeatureDataset (train mode): batched
    access via the native reader + host tokenization of the chosen caption."""

    def __init__(self, path: str, uni_prompting, seed: int = 0, num_tokens: int = 256):
        from omnimamba_tpu.data.coco import MSCOCOFeatureDataset

        self.reader = NativeCocoReader(path)
        self.uni = uni_prompting
        self.seed = seed
        self.num_tokens = num_tokens
        # reuse the caption-block packer for layout fidelity
        self._py = MSCOCOFeatureDataset.__new__(MSCOCOFeatureDataset)
        self._py.uni_prompting = uni_prompting
        self._py.pad_token_id = int(uni_prompting.text_tokenizer.pad_token_id)
        sp = uni_prompting.sptids_dict
        self._py.prefix = np.array([sp["<|t2i|>"], sp["<|sot|>"]], np.int64)
        self._py.suffix = np.array(
            [sp["<|eot|>"], sp["<|soi|>"], sp["<|eoi|>"]], np.int64
        )

    def __len__(self):
        return len(self.reader)

    def read_batch(self, indices: np.ndarray, epoch: int = 0):
        tokens, captions = self.reader.read_batch(
            indices, num_tokens=self.num_tokens, seed=self.seed + epoch * 0x9E3779B9
        )
        blocks = np.stack([self._py._caption_block(c) for c in captions])
        return {"inputs": tokens.astype(np.int64), "caption_ids": blocks}
