"""Dual-task trainer: jitted sharded train step + the driver loop.

Reference: ``trainer.py`` (Stage2Trainer) + HF Trainer internals it leans on.
The step computes ``loss = loss_t2i + loss_mmu`` over one combined batch
(``compute_loss``, trainer.py:113-127), differentiates the whole params tree,
masks frozen params via the optimizer chain, applies AdamW, and logs both
per-task losses (``log``, trainer.py:129-132).

TPU-native: the step is one ``jax.jit`` with param/batch shardings over the
(dp, fsdp, tp) mesh — DP grad all-reduce (the reference's DDP/NCCL boundary,
SURVEY §3.1) becomes a GSPMD-inserted psum; nothing here calls collectives
by hand. Gradient checkpointing (remat) trades FLOPs for HBM on the 48-block
scan.
"""

from __future__ import annotations

import time
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from omnimamba_tpu.config import TrainConfig
from omnimamba_tpu.models.omnimamba import OmniMambaModel, mmu_loss, t2i_loss
from omnimamba_tpu.parallel.sharding import batch_sharding
from omnimamba_tpu.train.optimizer import make_optimizer, trainable_mask


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def create_train_state(params, cfg: TrainConfig, stage: Optional[str] = None):
    tx, schedule, tmask = make_optimizer(params, cfg, stage)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0)), tx


def make_train_step(
    model: OmniMambaModel,
    tx,
    cfg: TrainConfig,
    *,
    mesh=None,
    dtype=jnp.bfloat16,
    scan_impl: Optional[str] = None,
    donate: bool = True,
):
    """Returns step(state, batch, key) -> (state, metrics), jitted; sharded
    over ``mesh`` when given.

    With ``cfg.grad_accum > 1`` every batch leaf carries a leading
    (accum,) micro-batch axis (see ``accumulate_batches``); the step scans
    the micro-batches, accumulates grads in fp32, and applies ONE
    optimizer update (reference: accelerate gradient_accumulation_steps).

    batch = {
      "t2i_flow": {"inputs": (B,256) int, "caption_ids": (B,73) int},
      "mmu_flow": {"pixel_values": {"dino","siglip"}: (B,H,W,3) float,
                    "input_ids": (B,T), "labels": (B,T),
                    "multimodal_mask": (B,) bool},
    } — the reference's flow names (trainer.py:102-107).
    """
    if scan_impl is None:
        scan_impl = cfg.scan_impl
    if scan_impl == "auto":
        # fused Pallas fwd+bwd on TPU (17x faster compiles, no decay-tensor
        # residuals); differentiable chunked-XLA elsewhere
        scan_impl = "pallas_ad" if jax.default_backend() == "tpu" else "chunked"

    def _freeze(params):
        """stop_gradient on frozen subtrees: XLA DCEs their whole backward
        (e.g. the 717M-param vision towers in finetune) — no grad buffers,
        no backward FLOPs (freeze_backbones analog at the autodiff level)."""
        tmask = trainable_mask(params, cfg.stage, cfg)
        return jax.tree.map(
            lambda p, t: p if t else jax.lax.stop_gradient(p), params, tmask
        )

    def loss_fn(params, batch, key):
        params = _freeze(params)
        # resolve remat="proj" (auto) against the traced batch shape.
        # Measured at 1.3B on one v5e:
        # - t2i-only <=~2.7k tok/dev on the pallas_ad path: "proj_ssd"
        #   (proj_xbd + pin the SSD kernel's output/chunk-state residuals so
        #   the backward skips re-running the Pallas forward) — 339 vs 361
        #   ms/step at B=8; OOMs by 1.2 G at B=12 (3948 tok).
        # - t2i-only <=4k tok/dev: "proj_xbd" (save x/bc/dt, drop z — one
        #   cheap matmul recompute) beats "proj" 420 vs 521 ms/step at B=8
        #   (saving z costs more HBM write bandwidth than its recompute
        #   costs FLOPs) and halves the residual memory.
        # - beyond ~4k tok/dev: full remat. proj_xbd is verified through
        #   B=12 (3948 tok, 597 ms) but at B=16 "proj" measured 2.3 G over
        #   HBM and "proj_xbd" fails too: what r2 recorded as a
        #   "deterministic TPU-compiler crash" is buffer-assignment HBM
        #   exhaustion at compile time, surfaced by the remote-compile
        #   helper as an opaque exit-1 (scripts/repro_projxbd_crash.py:
        #   B=16 x 48L proj_xbd fails; B=14, 24-layer, and "proj" all
        #   compile — the residuals simply don't fit, so full remat at
        #   B=16 is correct, not a workaround).
        # Mixed (stage-2) steps resolve remat PER FLOW (VERDICT r3 item 3):
        # r2 measured "proj_xbd" on BOTH flows 958 M over HBM at t2i B=6 +
        # mmu 1182 tok, so r2/r3 fell back to full remat everywhere the
        # moment any mmu flow appeared. The mmu rows (frozen towers already
        # stop_gradient-DCE'd) keep full remat by default (cfg.remat_mmu
        # overrides), but the t2i flow now keeps its measured policy —
        # only its own tokens count against the residual budget, with the
        # mmu residual share freed by the mmu-side full remat
        # (scripts/profile_train.py step --mmu measures the mixed shape).
        remat = cfg.remat
        if remat == "proj":
            toks = 0
            if "t2i_flow" in batch:
                b, nc = batch["t2i_flow"]["caption_ids"].shape
                toks += b * (nc + batch["t2i_flow"]["inputs"].shape[1])
            n_dev = mesh.size if mesh is not None else 1
            if toks / n_dev > 4000:
                remat = True
            elif (
                toks / n_dev <= 2700
                and scan_impl == "pallas_ad"
                and "mmu_flow" not in batch
            ):
                # proj_ssd pins ~1 GB of SSD kernel outputs on top of
                # proj_xbd; safe headroom is only measured for t2i-only
                remat = "proj_ssd"
            else:
                remat = "proj_xbd"
        remat_mmu = cfg.remat_mmu if cfg.remat_mmu is not None else True
        k1, k2 = jax.random.split(key)
        loss_t2i = jnp.float32(0.0)
        loss_mmu = jnp.float32(0.0)
        if cfg.t2i_task and "t2i_flow" in batch:
            loss_t2i = t2i_loss(
                params,
                model,
                batch["t2i_flow"]["inputs"],
                batch["t2i_flow"]["caption_ids"],
                dtype=dtype,
                dropout_key=k1,
                scan_impl=scan_impl,
                remat=remat,
            )
        if cfg.mmu_task and "mmu_flow" in batch:
            mmu = batch["mmu_flow"]
            loss_mmu = mmu_loss(
                params,
                model,
                mmu["pixel_values"],
                mmu["input_ids"],
                mmu["labels"],
                mmu["multimodal_mask"],
                dtype=dtype,
                dropout_key=k2,
                scan_impl=scan_impl,
                remat=remat_mmu,
            )
        loss = loss_t2i + loss_mmu  # summed (trainer.py:121)
        return loss, {"loss_t2i": loss_t2i, "loss_mmu": loss_mmu}

    accum = max(int(getattr(cfg, "grad_accum", 1) or 1), 1)

    def step(state: TrainState, batch, key):
        if accum == 1:
            (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, key
            )
        else:
            # gradient accumulation (reference: accelerate's
            # gradient_accumulation_steps): batch leaves carry a leading
            # (accum,) micro-batch axis; lax.scan keeps ONE micro-batch of
            # activations live at a time and accumulates grads in fp32
            # (bf16 += would lose low bits across micro-steps)
            keys = jax.random.split(key, accum)

            def micro(g_acc, xs):
                mb, k = xs
                (l, p), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, mb, k
                )
                g_acc = jax.tree.map(
                    lambda a, b: a + b.astype(jnp.float32), g_acc, g
                )
                return g_acc, {"loss": l, **p}

            g0 = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            g_sum, ms = jax.lax.scan(micro, g0, (batch, keys))
            # back to param dtype so the optimizer sees the same dtypes as
            # the accum=1 path (moments are initialized from params)
            grads = jax.tree.map(
                lambda g, p: (g / accum).astype(p.dtype), g_sum, state.params
            )
            loss = ms["loss"].mean()
            parts = {k: ms[k].mean() for k in ("loss_t2i", "loss_mmu")}
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # NOT optax.global_norm: its vdot path materializes the bf16 g*g
        # product per leaf (3x768 MB HLO temps at 1.3B — the measured OOM
        # margin at stage-2 mixed). A square->reduce per leaf fuses into
        # one pass with no temp, accumulating in fp32.
        gnorm = jnp.sqrt(
            sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree.leaves(grads)
            )
        )
        metrics = {"loss": loss, "grad_norm": gnorm, **parts}
        return TrainState(params, opt_state, state.step + 1), metrics

    # With a mesh, shardings propagate from the placed arguments (params via
    # parallel.shard_params, batch via shard_batch); GSPMD inserts the psums.
    return jax.jit(step, donate_argnums=0 if donate else ())


def shard_batch(mesh, batch, *, stacked: bool = False):
    """Place host batch arrays with the batch dim on dp.

    ``stacked=True`` marks grad-accumulation batches whose leaves carry a
    leading (accum,) micro-batch axis: the accum axis stays replicated
    (it is scanned over) and the per-micro batch dim (axis 1) shards.
    """
    if mesh is None:
        return jax.tree.map(jnp.asarray, batch)
    sh = batch_sharding(mesh)

    dp = mesh.shape.get("dp", 1)
    axis = 1 if stacked else 0

    def put(x):
        x = jnp.asarray(x)
        if x.ndim <= axis or x.shape[axis] % dp != 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = [None] * x.ndim
        spec[axis] = "dp"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, batch)


def accumulate_batches(loader, accum: int):
    """Group ``accum`` consecutive loader batches into one stacked batch
    (new leading micro-batch axis on every leaf) for the scan-based
    gradient-accumulation step; a trailing partial group is dropped.

    An epoch with fewer than ``accum`` batches yields NOTHING — the outer
    ``while step < max_steps`` loop would then spin forever making no
    progress, so that configuration raises instead."""
    import numpy as np

    if accum <= 1:
        yield from loader
        return
    buf = []
    yielded = 0
    for b in loader:
        buf.append(b)
        if len(buf) == accum:
            yield jax.tree.map(lambda *xs: np.stack(xs), *buf)
            yielded += 1
            buf = []
    if not yielded:
        raise ValueError(
            f"grad_accum={accum} exceeds the loader's batches per epoch "
            f"({len(buf)}) — no optimizer step could ever run"
        )


class MetricsWriter:
    """JSONL metrics sink (offline-friendly analog of the reference's wandb
    logging via HF Trainer, SURVEY §5.5)."""

    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "a", buffering=1)

    def log(self, step: int, metrics: dict):
        import json

        self._fh.write(json.dumps({"step": step, **metrics}) + "\n")

    def close(self):
        self._fh.close()


class TensorBoardWriter:
    """TensorBoard scalar sink (the reference logs through HF Trainer's
    report_to, train_stage2.py:19 / README.md:76). Uses the tensorboard
    package (via torch.utils.tensorboard — CPU-only torch is in the image);
    becomes a warning + no-op when unavailable."""

    def __init__(self, log_dir: str):
        self._w = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(log_dir=log_dir)
        except Exception as e:  # noqa: BLE001
            print(f"[metrics] tensorboard unavailable ({e}); scalars dropped")

    def log(self, step: int, metrics: dict):
        if self._w is None:
            return
        for k, v in metrics.items():
            try:
                self._w.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self):
        if self._w is not None:
            self._w.close()


class WandbWriter:
    """wandb sink: active when the wandb package exists AND the env is
    logged in; otherwise a warning + no-op (zero-egress default here)."""

    def __init__(self, project: str = "omnimamba-tpu", run_name: str = ""):
        self._wandb = None
        try:
            import wandb  # noqa: PLC0415

            wandb.init(project=project, name=run_name or None)
            self._wandb = wandb
        except Exception as e:  # noqa: BLE001
            print(f"[metrics] wandb unavailable ({e}); metrics dropped")

    def log(self, step: int, metrics: dict):
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def close(self):
        if self._wandb is not None:
            self._wandb.finish()


class MultiWriter:
    """Fan a metrics stream out to several sinks."""

    def __init__(self, *writers):
        self.writers = [w for w in writers if w is not None]

    def log(self, step: int, metrics: dict):
        for w in self.writers:
            w.log(step, metrics)

    def close(self):
        for w in self.writers:
            w.close()


class Trainer:
    """The training loop (max_steps, logging, checkpoint cadence), mirroring
    the reference CLI behaviour (train_stage2.py + HF Trainer loop)."""

    def __init__(
        self,
        model: OmniMambaModel,
        params,
        cfg: TrainConfig,
        combined_loader,
        *,
        mesh=None,
        dtype=jnp.bfloat16,
        checkpoint_manager=None,
        log_fn=print,
        metrics_writer=None,
        eval_loader=None,
    ):
        self.model = model
        self.cfg = cfg
        self.loader = combined_loader
        self.mesh = mesh
        self.log_fn = log_fn
        self.checkpoint_manager = checkpoint_manager
        self.metrics_writer = metrics_writer
        self.eval_loader = eval_loader
        self.dtype = dtype
        self.state, self.tx = create_train_state(params, cfg)
        self.step_fn = make_train_step(model, self.tx, cfg, mesh=mesh, dtype=dtype)

    def train(
        self,
        resume_step: int = 0,
        max_steps: Optional[int] = None,
        profile_dir: Optional[str] = None,
        profile_steps: tuple = (10, 15),
    ):
        """Run the loop. ``profile_dir`` captures a jax.profiler trace over
        the [start, stop) step window (SURVEY §5.1 TPU equivalent). On any
        exception an emergency checkpoint is written before re-raising
        (failure-recovery affordance the reference lacks, SURVEY §5.3)."""
        try:
            return self._train_inner(resume_step, max_steps, profile_dir, profile_steps)
        except BaseException:
            if self.checkpoint_manager is not None:
                try:
                    self.checkpoint_manager.save(
                        int(self.state.step), self.state, wait=True
                    )
                    self.log_fn(
                        f"[emergency] saved checkpoint at step {int(self.state.step)}"
                    )
                except Exception as e:  # noqa: BLE001
                    self.log_fn(f"[emergency] checkpoint save failed: {e}")
            raise

    def _train_inner(self, resume_step, max_steps, profile_dir, profile_steps):
        max_steps = max_steps or self.cfg.max_steps
        key = jax.random.PRNGKey(self.cfg.seed)
        step = resume_step
        t_last = time.time()
        step_last = step
        metrics = {}
        accum = max(int(self.cfg.grad_accum or 1), 1)
        while step < max_steps:
            for batch in accumulate_batches(self.loader, accum):
                if step >= max_steps:
                    break
                if profile_dir is not None and step == profile_steps[0]:
                    jax.profiler.start_trace(profile_dir)
                key, sub = jax.random.split(key)
                batch = shard_batch(self.mesh, batch, stacked=accum > 1)
                self.state, metrics = self.step_fn(self.state, batch, sub)
                step += 1
                if profile_dir is not None and step == profile_steps[1]:
                    jax.profiler.stop_trace()
                if step % self.cfg.logging_steps == 0 or step == 1:
                    m = {k: float(v) for k, v in metrics.items()}
                    dt = time.time() - t_last
                    n_done = step - step_last
                    t_last = time.time()
                    step_last = step
                    self.log_fn(
                        f"step {step} loss {m['loss']:.4f} "
                        f"(t2i {m['loss_t2i']:.4f} mmu {m['loss_mmu']:.4f}) "
                        f"gnorm {m['grad_norm']:.3f} "
                        f"{n_done / max(dt, 1e-9):.2f} it/s"
                    )
                if self.metrics_writer is not None and step % self.cfg.logging_steps == 0:
                    self.metrics_writer.log(step, {k: float(v) for k, v in metrics.items()})
                if self.checkpoint_manager is not None and step % self.cfg.save_steps == 0:
                    self.checkpoint_manager.save(step, self.state)
                if (
                    self.eval_loader is not None
                    and self.cfg.eval_steps
                    and step % self.cfg.eval_steps == 0
                ):
                    self.evaluate()
        return self.state, metrics

    def evaluate(self, metric_key_prefix: str = "eval"):
        """Average per-task losses over the eval loader (a working version of
        the reference Stage2Trainer.evaluate, trainer.py:134-150, whose
        accumulator is buggy there — and which never covered the mmu flow).

        Eval batches may be bare t2i dicts ({"inputs", "caption_ids"}), or
        flow-keyed dicts carrying "t2i_flow" and/or "mmu_flow" (the training
        batch schema); each present flow contributes its own averaged loss.
        """
        from omnimamba_tpu.models.omnimamba import mmu_loss, t2i_loss

        assert self.eval_loader is not None, "no eval loader configured"
        # jitted entry points are cached on self: jit keys on function
        # identity, so fresh lambdas per call would retrace (and, cold,
        # recompile for minutes at 1.3B) on EVERY periodic eval
        if not hasattr(self, "_eval_fns"):
            self._eval_fns = (
                jax.jit(
                    lambda p, img, cap: t2i_loss(
                        p, self.model, img, cap, dtype=self.dtype
                    )
                ),
                jax.jit(
                    lambda p, px, ids, lbl, mm: mmu_loss(
                        p, self.model, px, ids, lbl, mm, dtype=self.dtype
                    )
                ),
            )
        t2i_fn, mmu_fn = self._eval_fns
        totals = {"t2i": 0.0, "mmu": 0.0}
        counts = {"t2i": 0, "mmu": 0}
        for batch in self.eval_loader:
            t2i = batch.get("t2i_flow", batch if "inputs" in batch else None)
            if t2i is not None:
                totals["t2i"] += float(
                    t2i_fn(
                        self.state.params,
                        jnp.asarray(t2i["inputs"]),
                        jnp.asarray(t2i["caption_ids"]),
                    )
                )
                counts["t2i"] += 1
            mmu = batch.get("mmu_flow")
            if mmu is not None:
                totals["mmu"] += float(
                    mmu_fn(
                        self.state.params,
                        jax.tree.map(jnp.asarray, mmu["pixel_values"]),
                        jnp.asarray(mmu["input_ids"]),
                        jnp.asarray(mmu["labels"]),
                        jnp.asarray(mmu["multimodal_mask"]),
                    )
                )
                counts["mmu"] += 1
        metrics = {}
        for task in ("t2i", "mmu"):
            if counts[task]:
                metrics[f"{metric_key_prefix}_{task}_loss"] = (
                    totals[task] / counts[task]
                )
        if counts["t2i"] and not counts["mmu"]:
            # back-compat key for t2i-only eval loaders
            metrics[f"{metric_key_prefix}_loss"] = metrics[
                f"{metric_key_prefix}_t2i_loss"
            ]
        self.log_fn(str(metrics))
        if self.metrics_writer is not None:
            self.metrics_writer.log(int(self.state.step), metrics)
        return metrics
