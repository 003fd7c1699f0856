"""Orbax checkpointing — the TPU-native replacement for HF Trainer's
``checkpoint-N/pytorch_model.bin`` cadence.

Reference behaviour mirrored (SURVEY §5.4): save every ``save_steps`` with
``save_total_limit`` retention (train_stage2.py:22-39), resume from the
latest step in a run dir, and ``find_latest_model_bin``-style discovery of
the newest timestamped run (util/data.py:8-34).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


class CheckpointManager:
    def __init__(self, directory: str, save_total_limit: int = 5):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_total_limit, create=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp

        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def lora_state(params: Any) -> Any:
    """LoRA-only sub-pytree — the analog of get_peft_model_state_dict
    (reference lora.py:27-70, bias='none' branch: keys containing 'lora')."""
    import jax

    def keep(path, leaf):
        names = [str(getattr(e, "key", "")) for e in path]
        return leaf if any("lora" in n for n in names) else None

    tree = jax.tree_util.tree_map_with_path(keep, params)

    def prune(t):
        if isinstance(t, dict):
            out = {k: prune(v) for k, v in t.items()}
            return {k: v for k, v in out.items() if v is not None} or None
        return t

    return prune(tree) or {}


def merge_lora_state(params: Any, lora: Any) -> Any:
    """Overlay a LoRA-only tree back onto full params."""

    def merge(dst, src):
        if isinstance(src, dict):
            out = dict(dst)
            for k, v in src.items():
                out[k] = merge(dst[k], v) if k in dst else v
            return out
        return src

    return merge(params, lora)


def find_latest_run_dir(output_dir: str) -> Optional[str]:
    """Newest timestamped run directory (util/data.py:8-20 semantics)."""
    if not os.path.isdir(output_dir):
        return None
    runs = sorted(
        (d for d in os.listdir(output_dir) if os.path.isdir(os.path.join(output_dir, d)))
    )
    return os.path.join(output_dir, runs[-1]) if runs else None


def save_params_npz(path: str, params: Any) -> None:
    """Flat single-file export (analog of the reference's flat .pth)."""
    import numpy as np

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            str(getattr(e, "key", getattr(e, "idx", ""))) for e in keypath
        )
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params_npz(path: str, template: Any) -> Any:
    import numpy as np

    data = np.load(path)
    leaves_paths = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    leaves = []
    for keypath, leaf in leaves_paths:
        name = "/".join(
            str(getattr(e, "key", getattr(e, "idx", ""))) for e in keypath
        )
        arr = data[name]
        assert arr.shape == leaf.shape, (name, arr.shape, leaf.shape)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)
