"""Pretokenized MS-COCO T2I dataset.

Reference: ``util/coco_dataset.py:79-137`` — JSONL rows of
``{"captions": [...], "tokens": [256 VQ ids]}``. Each item yields the
73-token caption block

    [<|t2i|> <|sot|> | 68 left-padded caption ids | <|eot|> <|soi|> <|eoi|>]

(``coco_dataset.py:88-94,125-131``) and the 256 image tokens; the model
splices images between <|soi|> and <|eoi|> (omnimamba.py:264). Eval items
drop the trailing <|eoi|> (72 ids, the inference prefix).

Host-side numpy; no torch. A synthetic generator supports tests/benches in
data-free environments.
"""

from __future__ import annotations

import json
import random
from typing import Dict, List, Optional, Tuple

import numpy as np

MAX_CAPTION_TOKENS = 68  # coco_dataset.py:86
NULL_PROMPT = "A picture"  # coco_dataset.py:84 (CFG null condition)


class MSCOCOFeatureDataset:
    def __init__(
        self,
        data_path: str,
        uni_prompting,
        sample_num: Optional[int] = None,
        drop_cond_prob: float = 0.0,  # reference sets 0 (:82)
        seed: int = 0,
    ):
        self.uni_prompting = uni_prompting
        self.pad_token_id = int(uni_prompting.text_tokenizer.pad_token_id)
        sp = uni_prompting.sptids_dict
        self.prefix = np.array([sp["<|t2i|>"], sp["<|sot|>"]], np.int64)
        self.suffix = np.array([sp["<|eot|>"], sp["<|soi|>"], sp["<|eoi|>"]], np.int64)
        self.drop_cond_prob = drop_cond_prob
        self.rng = random.Random(seed)
        self.eval = sample_num is not None

        with open(data_path) as f:
            lines = f.readlines()
        self.rng.shuffle(lines)
        if sample_num is not None:
            lines = lines[:sample_num]
        self.lines = lines

    def __len__(self) -> int:
        return len(self.lines)

    def _caption_block(self, caption: str) -> np.ndarray:
        ids = np.asarray(
            self.uni_prompting.text_tokenizer(caption)["input_ids"], np.int64
        )
        block = np.full(MAX_CAPTION_TOKENS, self.pad_token_id, np.int64)
        n = min(len(ids), MAX_CAPTION_TOKENS)
        if n:
            block[-n:] = ids[:n]  # left pad (coco_dataset.py:125-130)
        return np.concatenate([self.prefix, block, self.suffix])

    def __getitem__(self, index: int):
        data = json.loads(self.lines[index])
        captions = data["captions"]
        if self.rng.random() < self.drop_cond_prob and not self.eval:
            caption = NULL_PROMPT
        else:
            caption = captions[self.rng.randint(0, len(captions) - 1)]
        block = self._caption_block(caption)
        if self.eval:
            return block[:-1], caption  # no <|eoi|> (coco_dataset.py:133)
        return np.asarray(data["tokens"], np.int64), block


def coco_collate(examples: List[Tuple[np.ndarray, np.ndarray]]) -> Dict[str, np.ndarray]:
    """{"inputs": (B,256) image ids, "caption_ids": (B,73)}
    (coco_dataset.py:62-69)."""
    return {
        "inputs": np.stack([e[0] for e in examples]),
        "caption_ids": np.stack([e[1] for e in examples]),
    }


class MSCOCODatabase:
    """Raw-image COCO dataset: center-crop + [-1,1] floats + captions.

    Reference: ``coco_dataset.py:27-59`` (pycocotools-based). This version
    parses the captions annotation JSON directly ({"images": [...],
    "annotations": [...]}) — no pycocotools dependency — and keeps the same
    item contract: (image (size,size,3) float32 CHW-free NHWC in [-1,1],
    [caption, ...]).
    """

    def __init__(self, root: str, ann_file: str, size: int = 256):
        import os

        self.root = root
        self.size = size
        with open(ann_file) as f:
            ann = json.load(f)
        self.files = {img["id"]: img["file_name"] for img in ann["images"]}
        self.captions: Dict[int, List[str]] = {}
        for a in ann["annotations"]:
            self.captions.setdefault(a["image_id"], []).append(a["caption"])
        self.keys = sorted(self.files)
        self._join = os.path.join

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, index: int):
        from PIL import Image

        from omnimamba_tpu.data.transforms import center_crop_resize

        key = self.keys[index]
        img = Image.open(self._join(self.root, self.files[key])).convert("RGB")
        arr = center_crop_resize(np.asarray(img, np.uint8), self.size)
        image = arr.astype(np.float32) / 127.5 - 1.0  # (size, size, 3) NHWC
        return image, list(self.captions.get(key, []))


def coco_eval_collate(examples) -> Dict[str, object]:
    """{"caption_ids": (B,72) prefix ids, "caption": list[str]}
    (coco_eval_collate_fn, coco_dataset.py:71-77)."""
    return {
        "caption_ids": np.stack([e[0] for e in examples]),
        "caption": [e[1] for e in examples],
    }


def make_synthetic_coco_jsonl(
    path: str, n: int = 64, num_tokens: int = 256, vocab: int = 16384, seed: int = 0
) -> str:
    """Write a schema-identical synthetic JSONL for tests/benches."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n):
            row = {
                "captions": [f"synthetic caption number {i} with objects"],
                "tokens": rng.integers(0, vocab, size=num_tokens).tolist(),
            }
            f.write(json.dumps(row) + "\n")
    return path
