"""Training CLI — mirrors ``train_stage2.py`` of the reference (same YAML
config surface, stages align/finetune), TPU-native underneath: one jitted
dual-task step over a (dp, fsdp, tp) mesh, Orbax checkpoints, per-task loss
logging.

Usage:
    python scripts/train.py --config config/config_stage2.yaml \
        [--dp N --fsdp N --tp N] [--synthetic-data]
"""

import argparse
import os
import sys
from datetime import datetime

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="config/config_stage2.yaml")
    parser.add_argument("--dp", type=int, default=0, help="0 = all devices on dp")
    parser.add_argument("--fsdp", type=int, default=1)
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument(
        "--synthetic-data", action="store_true",
        help="generate schema-identical synthetic datasets (no downloads)",
    )
    parser.add_argument("--platform", type=str, default=None,
                        help="force jax platform (e.g. cpu for smoke runs)")
    parser.add_argument("--tensorboard", action="store_true",
                        help="also write TensorBoard scalars to <run>/tb")
    parser.add_argument("--wandb", action="store_true",
                        help="also log to wandb when available (no-op offline)")
    parser.add_argument("--batch-t2i", type=int, default=None,
                        help="override cfg.batch_size_t2i (PER-MESH batch; "
                        "the shipped YAMLs assume 8 chips)")
    parser.add_argument("--batch-mmu", type=int, default=None,
                        help="override cfg.batch_size_mmu")
    parser.add_argument("--grad-accum", type=int, default=None,
                        help="override cfg.grad_accum (micro-batches per "
                        "optimizer step; reference train_stage2.py:58)")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("OMNIMAMBA_JAX_CACHE", "/tmp/omnimamba_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from omnimamba_tpu.config import TrainConfig
    from omnimamba_tpu.data.coco import (
        MSCOCOFeatureDataset,
        coco_collate,
        make_synthetic_coco_jsonl,
    )
    from omnimamba_tpu.data.llava import (
        get_dataset_and_collator,
        make_synthetic_llava_json,
    )
    from omnimamba_tpu.data.loader import CombinedLoader, DataLoader
    from omnimamba_tpu.data.transforms import vit_transform
    from omnimamba_tpu.factory import build_model
    from omnimamba_tpu.parallel.mesh import create_mesh
    from omnimamba_tpu.parallel.sharding import shard_params
    from omnimamba_tpu.train.trainer import MetricsWriter, Trainer
    from omnimamba_tpu.utils.checkpoint import CheckpointManager

    cfg = TrainConfig.from_yaml(args.config) if os.path.exists(args.config) else TrainConfig()
    if args.max_steps:
        cfg.max_steps = args.max_steps
    if args.batch_t2i:
        cfg.batch_size_t2i = args.batch_t2i
    if args.batch_mmu:
        cfg.batch_size_mmu = args.batch_mmu
    if args.grad_accum:
        cfg.grad_accum = args.grad_accum

    run_name = f"{cfg.omnimamba_model}_{datetime.now().strftime('%Y-%m-%d_%H-%M-%S')}"
    out_dir = os.path.join(cfg.output_dir, run_name)
    os.makedirs(out_dir, exist_ok=True)

    # param dtype follows the config's precision (all shipped YAMLs train
    # bf16, train_stage2.py:58); fp32 params + AdamW at 1.3B + vision
    # towers alone exceed one chip's 16 GB HBM
    param_dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    model, params, uni = build_model(cfg, dtype=param_dtype)

    # --- data --------------------------------------------------------------
    loaders = {}
    if cfg.t2i_task:
        path = cfg.dataset
        if args.synthetic_data or not os.path.exists(path):
            path = os.path.join(out_dir, "synthetic_coco.jsonl")
            make_synthetic_coco_jsonl(path, n=max(cfg.batch_size_t2i * 4, 64))
            print(f"[data] synthetic t2i jsonl at {path}")
        from omnimamba_tpu.data.native import (
            NativeCocoDataset,
            NativeCocoLoader,
            native_available,
        )

        if native_available():
            nds = NativeCocoDataset(path, uni)
            loaders["t2i_flow"] = NativeCocoLoader(nds, cfg.batch_size_t2i)
            print("[data] t2i via native mmap reader (libomnidata)")
        else:
            ds = MSCOCOFeatureDataset(path, uni)
            loaders["t2i_flow"] = DataLoader(ds, cfg.batch_size_t2i, coco_collate,
                                         num_threads=cfg.num_workers)
    if cfg.mmu_task:
        ann = None
        if args.synthetic_data:
            ann = make_synthetic_llava_json(
                os.path.join(out_dir, "synthetic_llava.json"),
                n=max(cfg.batch_size_mmu * 4, 16),
                with_images=True,
            )
        ds_mmu, collator = get_dataset_and_collator(
            cfg.stage,
            uni.text_tokenizer,
            eot_id=uni.sptids_dict["<|eot|>"],
            max_length=449,
            annotation_json=ann,
            image_dir="." if ann else None,
        )
        loaders["mmu_flow"] = DataLoader(ds_mmu, cfg.batch_size_mmu, collator,
                                 num_threads=cfg.num_workers)
    combined = CombinedLoader(loaders)

    # --- mesh --------------------------------------------------------------
    n_dev = jax.device_count()
    shape = {}
    if args.dp:
        shape["dp"] = args.dp
    if args.fsdp > 1:
        shape["fsdp"] = args.fsdp
    if args.tp > 1:
        shape["tp"] = args.tp
    if not shape:
        # no CLI mesh flags: a non-trivial cfg.mesh_shape wins, else all-dp
        yaml_shape = {k: v for k, v in dict(cfg.mesh_shape or {}).items() if v > 1}
        shape = yaml_shape or {"dp": n_dev}
    mesh = create_mesh(shape)
    print(f"[mesh] {dict(mesh.shape)} over {n_dev} devices")
    params = shard_params(mesh, params)

    # device-side transform of raw uint8 MMU pixels into per-encoder tensors
    def preprocess(batch):
        if "mmu_flow" in batch and "pixel_values" in batch["mmu_flow"]:
            raw = batch["mmu_flow"]["pixel_values"]
            if not isinstance(raw, dict):
                batch["mmu_flow"]["pixel_values"] = {
                    "dino": vit_transform(jnp.asarray(raw), model.vision_cfg.dino),
                    "siglip": vit_transform(jnp.asarray(raw), model.vision_cfg.siglip),
                }
        return batch

    class PreprocLoader:
        def __init__(self, inner):
            self.inner = inner

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            for b in self.inner:
                yield preprocess(b)

    ckpt = CheckpointManager(os.path.join(out_dir, "ckpts"), cfg.save_total_limit)
    metrics = MetricsWriter(os.path.join(out_dir, "metrics.jsonl"))
    if args.tensorboard or args.wandb:
        from omnimamba_tpu.train.trainer import (
            MultiWriter, TensorBoardWriter, WandbWriter,
        )

        sinks = [metrics]
        if args.tensorboard:
            sinks.append(TensorBoardWriter(os.path.join(out_dir, "tb")))
        if args.wandb:
            sinks.append(WandbWriter(run_name=os.path.basename(out_dir)))
        metrics = MultiWriter(*sinks)
    eval_loader = None
    if cfg.eval_steps:
        # no separate eval split ships with the reference configs
        # (evaluation_strategy defaults off there too); periodic eval runs
        # on a fixed sample of training batches unless a dedicated eval
        # loader is wired at the library level
        import itertools

        class _EvalSample:
            def __init__(self, inner, n=2):
                self.inner, self.n = inner, n

            def __iter__(self):
                return itertools.islice(iter(self.inner), self.n)

        eval_loader = _EvalSample(PreprocLoader(combined))
        print(f"[eval] every {cfg.eval_steps} steps on {eval_loader.n} "
              "training batches (no eval split configured)")
    trainer = Trainer(
        model, params, cfg, PreprocLoader(combined),
        mesh=mesh, checkpoint_manager=ckpt, metrics_writer=metrics,
        eval_loader=eval_loader,
    )
    if cfg.resume_dir:
        mgr = CheckpointManager(os.path.join(cfg.resume_dir, "ckpts"))
        step = mgr.latest_step()
        if step is not None:
            trainer.state = mgr.restore(trainer.state, step)
            print(f"[resume] from {cfg.resume_dir} step {step}")
    trainer.train()


if __name__ == "__main__":
    main()
