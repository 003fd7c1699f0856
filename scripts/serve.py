"""Serving CLI: batched T2I + MMU inference over HTTP.

Usage:
    python scripts/serve.py [--port 8000] [--t2i-batch 8] [--mmu-batch 8] \
        [--ckpt weights] [--int8] [--config config/config_stage2.yaml]

Endpoints:
    GET  /healthz
    POST /v1/t2i {"prompt": "..."}                        -> image PNG b64
    POST /v1/mmu {"image_png_b64": "...", "question": "..."} -> text
"""

import argparse
import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--config", default="config/config_stage2.yaml")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--t2i-batch", type=int, default=8)
    parser.add_argument("--mmu-batch", type=int, default=8)
    parser.add_argument("--mmu-max-new", type=int, default=64)
    parser.add_argument("--max-wait-ms", type=float, default=20.0)
    parser.add_argument("--int8", action="store_true", help="int8 weight-only serving")
    parser.add_argument("--merge-lora-task", default=None,
                        choices=["t2i", "mmu"],
                        help="single-task deployment: fold that task's LoRA "
                        "into in_proj (faster decode; bf16 rounding-scale differences possible); the other task's "
                        "endpoint is refused")
    parser.add_argument("--bf16-state", action="store_true",
                        help="carry decode SSM state in bf16 (higher batched "
                             "throughput; audit greedy fidelity per model)")
    parser.add_argument("--int8-state", action="store_true",
                        help="carry decode SSM state as scaled int8 (halves "
                             "bf16-state traffic again; error is decay-"
                             "contracted — audit fidelity per model)")
    parser.add_argument("--continuous", action="store_true",
                        help="continuous-batching mmu lane: requests join a "
                             "fixed slot pool mid-flight (serve/continuous.py)"
                             " — batch throughput at near-solo latency for "
                             "mixed-length traffic")
    parser.add_argument("--slots", type=int, default=8,
                        help="continuous lane slot count")
    parser.add_argument("--chunk", type=int, default=16,
                        help="decode steps per host tick in the continuous "
                             "lane (amortizes the ~30 ms tunnel sync)")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("OMNIMAMBA_JAX_CACHE", "/tmp/omnimamba_jax_cache"),
    )
    import jax.numpy as jnp

    from omnimamba_tpu.config import TrainConfig
    from omnimamba_tpu.factory import build_model
    from omnimamba_tpu.serve.server import OmniMambaService, make_server

    cfg = TrainConfig.from_yaml(args.config) if os.path.exists(args.config) else TrainConfig()
    if args.ckpt:
        cfg.omnimamba_ckpt = args.ckpt
    model, params, uni = build_model(cfg, stage="inference", dtype=jnp.bfloat16)
    if args.merge_lora_task:
        # merge BEFORE quantization (folding into int8 blocks would
        # re-quantize noise); the service keeps the task guard
        from omnimamba_tpu.utils.lora import merge_lora

        params = merge_lora(params, args.merge_lora_task, model.cfg.lora)
        print(f"[serve] {args.merge_lora_task} LoRA merged into in_proj")
    if args.int8:
        from omnimamba_tpu.ops.quant import quantize_decode_params

        params = quantize_decode_params(params)
        print("[serve] int8 weight-only quantization on")
    # single-host serving: collapse the 4 in_proj column-slice matmuls into
    # one operand per layer (numerics-identical; fewer decode dispatches;
    # exact for int8 too — the scales are per-output-column)
    from omnimamba_tpu.ops.quant import fuse_in_proj

    params = fuse_in_proj(params)

    import jax.numpy as jnp2

    service = OmniMambaService(
        model, params, uni,
        t2i_batch=args.t2i_batch, mmu_batch=args.mmu_batch,
        mmu_max_new=args.mmu_max_new,
        cache_dtype=("int8" if args.int8_state
                     else jnp2.bfloat16 if args.bf16_state else "auto"),
        merge_lora_task=args.merge_lora_task,
    )
    server = make_server(
        service, args.host, args.port, args.max_wait_ms,
        continuous_mmu=args.continuous, continuous_slots=args.slots,
        continuous_chunk=args.chunk,
    )
    lane = (f"continuous mmu: {args.slots} slots x {args.chunk}-step chunks"
            if args.continuous else f"mmu batch {args.mmu_batch}")
    print(f"[serve] listening on {args.host}:{args.port} "
          f"(t2i batch {args.t2i_batch}, {lane})")
    server.serve_forever()


if __name__ == "__main__":
    main()
