"""MMU instruction datasets + collator.

Reference: ``util/llava_instruct_data.py`` (AlignDataset caption-only,
FinetuneDataset multi-turn with loss only on gpt turns, corrupt-image dummy
fallback) and ``models/cobra/data_utils.py:16-78``
(PaddedCollatorForLanguageModeling: stacks dict pixel tensors, builds
``multimodal_indices`` marking rows with real images, dummy zeros for
text-only rows).

Host-side numpy. Images are decoded with PIL and returned as raw uint8
(B, H, W, 3); resize+normalize happen on-device (data/transforms.py).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Type

import numpy as np

from omnimamba_tpu.data.prompt_builder import MambaPromptBuilder, PromptBuilder

IGNORE_INDEX = -100


def _load_image_uint8(path: str, size: int) -> Optional[np.ndarray]:
    """Decode + square-resize to (size, size, 3) uint8; None on failure
    (the corrupt-image fallback, llava_instruct_data.py:217-227)."""
    try:
        from PIL import Image, ImageFile

        ImageFile.LOAD_TRUNCATED_IMAGES = True
        img = Image.open(path).convert("RGB").resize((size, size))
        return np.asarray(img, np.uint8)
    except Exception:
        alt = path.replace("jpg", "gif")
        if alt != path and os.path.exists(alt):
            try:
                from PIL import Image

                img = Image.open(alt).convert("RGB").resize((size, size))
                return np.asarray(img, np.uint8)
            except Exception:
                return None
        return None


class AlignDataset:
    """Caption-only alignment stage (llava_instruct_data.py:25-119):
    input = "{caption}<|endoftext|>", labels = copy (image spliced later)."""

    def __init__(
        self,
        chat_json: str,
        image_dir: str,
        tokenizer,
        max_length: int = 381,
        image_size: int = 384,
    ):
        self.image_dir = image_dir
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.image_size = image_size
        self.pad_token_id = int(tokenizer.pad_token_id)
        with open(chat_json) as f:
            self.examples = json.load(f)

    def __len__(self):
        return len(self.examples)

    def __getitem__(self, idx: int) -> Dict:
        ex = self.examples[idx]
        caption = ex["conversations"][-1]["value"].strip() + self.tokenizer.eos_token
        ids = np.asarray(self.tokenizer(caption)["input_ids"], np.int64)
        n = min(self.max_length, len(ids))
        input_ids = np.full(self.max_length, self.pad_token_id, np.int64)
        labels = np.full(self.max_length, IGNORE_INDEX, np.int64)
        input_ids[:n] = ids[:n]
        labels[:n] = ids[:n]
        pixels = _load_image_uint8(
            os.path.join(self.image_dir, ex["image"]), self.image_size
        )
        return {"pixel_values": pixels, "input_ids": input_ids, "labels": labels}

    def get_modality_lengths(self, n_image_patches: int):
        """(is_multimodal, length) per example for length-grouped samplers
        (llava_instruct_data.py:109-117: word count + patch count, with
        '<image>' stripped before splitting)."""
        out = []
        for ex in self.examples:
            is_mm = "image" in ex
            n_words = sum(
                len(t["value"].replace("<image>", "").split())
                for t in ex["conversations"]
            )
            out.append((is_mm, n_image_patches + n_words if is_mm else n_words))
        return out


class FinetuneDataset:
    """Multi-turn instruct stage (llava_instruct_data.py:122-244):
    loss only on gpt turns, <|eot|> appended, right-padded to max_length."""

    def __init__(
        self,
        instruct_json: str,
        image_dir: str,
        tokenizer,
        prompt_builder_fn: Type[PromptBuilder] = MambaPromptBuilder,
        max_length: int = 449,  # trainer.py:76
        eot_id: int = 0,
        image_size: int = 384,
        multimodal_only: bool = True,  # reference filters to image rows (:145)
    ):
        self.image_dir = image_dir
        self.tokenizer = tokenizer
        self.prompt_builder_fn = prompt_builder_fn
        self.max_length = max_length
        self.eot_id = int(eot_id)
        self.image_size = image_size
        self.pad_token_id = int(tokenizer.pad_token_id)
        with open(instruct_json) as f:
            examples = json.load(f)
        if multimodal_only:
            examples = [e for e in examples if "image" in e]
        self.examples = examples

    def __len__(self):
        return len(self.examples)

    def __getitem__(self, idx: int) -> Dict:
        ex = self.examples[idx]
        builder = self.prompt_builder_fn(model_family="cobra")
        input_ids: List[int] = []
        labels: List[int] = []
        for turn_idx, turn in enumerate(ex["conversations"]):
            msg = builder.add_turn(turn["from"], turn["value"])
            turn_ids = list(self.tokenizer(msg)["input_ids"])
            if len(input_ids) + len(turn_ids) > self.max_length - 1:
                break  # llava_instruct_data.py:178-180
            if turn_idx % 2 == 0:
                labels.extend([IGNORE_INDEX] * len(turn_ids))
            else:
                labels.extend(turn_ids)
            input_ids.extend(turn_ids)
        input_ids.append(self.eot_id)  # :197
        labels.append(IGNORE_INDEX)

        n = min(self.max_length, len(input_ids))
        out_ids = np.full(self.max_length, self.pad_token_id, np.int64)
        out_lab = np.full(self.max_length, IGNORE_INDEX, np.int64)
        out_ids[:n] = np.asarray(input_ids[:n])
        out_lab[:n] = np.asarray(labels[:n])

        pixels = None
        if "image" in ex:
            pixels = _load_image_uint8(
                os.path.join(self.image_dir, ex["image"]), self.image_size
            )
        return {"pixel_values": pixels, "input_ids": out_ids, "labels": out_lab}

    def get_modality_lengths(self):
        """(is_multimodal, word count) per example
        (llava_instruct_data.py:232-239 — no patch count in this variant)."""
        return [
            (
                "image" in ex,
                sum(len(t["value"].split()) for t in ex["conversations"]),
            )
            for ex in self.examples
        ]


class PaddedCollatorForLanguageModeling:
    """Port of data_utils.py:16-78: stack ids/labels, dummy zero images for
    text-only rows, ``multimodal_mask`` marking real-image rows (the
    reference's ``multimodal_indices`` as a fixed-shape bool mask)."""

    def __init__(self, max_length: int, pad_token_id: int, image_size: int = 384):
        self.max_length = max_length
        self.pad_token_id = pad_token_id
        self.image_size = image_size

    def __call__(self, examples: List[Dict]) -> Dict[str, np.ndarray]:
        input_ids = np.stack([e["input_ids"] for e in examples])
        labels = np.stack([e["labels"] for e in examples])
        mask = np.array([e["pixel_values"] is not None for e in examples])
        s = self.image_size
        pixels = np.stack(
            [
                e["pixel_values"]
                if e["pixel_values"] is not None
                else np.zeros((s, s, 3), np.uint8)
                for e in examples
            ]
        )
        return {
            "pixel_values": pixels,  # raw uint8; per-encoder transform on device
            "input_ids": input_ids,
            "labels": labels,
            "multimodal_mask": mask,
        }


DATASET_INITIALIZER = {
    "align": AlignDataset,
    "finetune": FinetuneDataset,
    "full-finetune": FinetuneDataset,
}


def get_dataset_and_collator(
    stage: str,
    tokenizer,
    *,
    dataset_root: str = "datasets/",
    prompt_builder_fn: Type[PromptBuilder] = MambaPromptBuilder,
    max_length: int = 449,
    eot_id: int = 0,
    image_size: int = 384,
    annotation_json: Optional[str] = None,
    image_dir: Optional[str] = None,
):
    """Stage dispatch with the reference's dataset paths
    (llava_instruct_data.py:269-297)."""
    collator = PaddedCollatorForLanguageModeling(max_length, tokenizer.pad_token_id, image_size)
    if stage == "align":
        ann = annotation_json or os.path.join(
            dataset_root, "llava/share-captioner_coco_lcs_676k_1121.json"
        )
        img_dir = image_dir or os.path.join(dataset_root, "llava/")
        return AlignDataset(ann, img_dir, tokenizer, max_length, image_size), collator
    if stage in ("finetune", "full-finetune"):
        ann = annotation_json or os.path.join(
            dataset_root, "llava/sharegpt4v_llava_v1_5_lvis4v_lrv_mix1231k.json"
        )
        img_dir = image_dir or os.path.join(dataset_root, "llava/")
        ds = FinetuneDataset(
            ann, img_dir, tokenizer, prompt_builder_fn, max_length, eot_id, image_size
        )
        return ds, collator
    raise ValueError(f"Stage `{stage}` is not supported!")


def make_synthetic_llava_json(path: str, n: int = 16, with_images: bool = True) -> str:
    """Schema-identical synthetic instruct JSON (multi-turn) for tests."""
    rows = []
    for i in range(n):
        row = {
            "conversations": [
                {"from": "human", "value": f"<image>\nWhat is in picture {i}?"},
                {"from": "gpt", "value": f"A synthetic object number {i}."},
                {"from": "human", "value": "Describe its color."},
                {"from": "gpt", "value": "It is a bright test-pattern color."},
            ]
        }
        if with_images:
            row["image"] = f"img_{i % 4}.jpg"
        rows.append(row)
    with open(path, "w") as f:
        json.dump(rows, f)
    return path
