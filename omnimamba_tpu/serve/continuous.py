"""Continuous (in-flight) batching decode engine — slot-based serving.

No reference analog (its inference is single-stream CLI scripts); this is
the production-serving layer the SSM's O(1) state makes UNIQUELY cheap on
TPU: admitting a request mid-flight is ONE row-write into the (n_layer, B,
...) decode state (constant bytes), not a KV-cache reshuffle. Design:

- a fixed pool of ``n_slots`` decode slots = one compiled program, static
  shapes; every slot advances together through the jitted chunk step;
- requests ADMIT at chunk boundaries: a bucketed single-row prefill
  (``backbone_forward`` with ``valid_len`` so bucket padding is an exact
  state no-op) produces that row's (conv, ssm) state, which is
  dynamic-update-sliced into the pool cache — in-flight slots are
  untouched and their streams are bit-identical to solo decodes;
- finished slots (eos / length) free at chunk boundaries and are reused
  immediately — a long request no longer holds the whole batch hostage
  (the static batcher's tail-latency failure mode);
- the host inspects tokens once per K-step CHUNK, not per token: one
  host<->device sync costs ~30 ms on the tunnel (utils/profiling), so
  per-token orchestration would cap serving at ~33 tok/s. ``lax.scan``
  inside the jitted chunk amortizes the sync K ways; admission latency is
  bounded by one chunk (~K * step-time).

Greedy decode is the default (the serving default everywhere in this
repo); ``enable_sampling=True`` compiles a chunk with PER-REQUEST
temperature / top-k / top-p / seed — each slot draws with
``fold_in(PRNGKey(seed), seq_index)``, so a sampled stream is
deterministic given its (seed, prompt) and independent of batchmates,
and a ``temperature=0`` request inside a sampling pool still takes the
exact argmax branch. Per-slot positions ride the ragged (B,)-vector
``pos`` the step path already supports. Inactive slots decode garbage
into state that is overwritten at admission — they cost FLOPs, not
correctness (measured: decode is HBM-bound, so idle slots are nearly
free).

Measured (1.3B int8w+bf16s, v5e-1, scripts/bench_continuous.py, 64 reqs x
64-tok prompts, budgets {32..256}, W=16, chunk=16):

- BURST (all 64 at once — static batching's best case, zero arrival
  raggedness): wall 0.94x vs the static batcher (7.32 vs 6.87 s), p50
  latency 1.06x, p95 1.01x — parity. Engine-piece costs at W=16: chunk
  (16 steps) 132 ms, prefill M=1/4/16 10/22/79 ms, insert M=1/4/16
  8/9/16 ms; a drain is ~2.5 s admission + ~5.3 s chunks over 40 ticks.
- Admissions are BATCHED per tick (one (M, Lb) prefill + one scatter
  insert per length bucket); the first solo-admission design paid one
  ~60 ms dispatch per request (~3.8 s of the wall at 64 reqs).
- ``warmup()`` (execution-based) is mandatory before traffic: cold
  program variants in the serving window measured 18-28 s for the same
  6 s workload, and AOT ``.lower().compile()`` does NOT prime jit's
  execution cache on this backend.
- STREAMING arrivals (--arrival-ms in the bench; the lane's real
  payoff — the static batcher decodes partial batches to the full
  max_new budget while slots here free and refill per-request):
  100 ms inter-arrival: p50 latency 1.92x better (1.45 vs 2.78 s),
  p95 1.15x, wall 1.04x; 400 ms: p50 2.13x (1.22 vs 2.60 s), p95
  1.33x, wall 1.05x.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class _Request:
    emb: np.ndarray  # (L, d) spliced input embeddings
    prompt_len: int
    max_new: int
    temperature: float = 0.0  # 0 = greedy (engine default everywhere)
    top_k: int = 0  # 0 = no top-k restriction (requires temperature > 0)
    top_p: float = 0.0  # 0 = no nucleus filter; in (0, 1) keeps the smallest
    #               set of tokens whose mass >= top_p (within max_top_k)
    min_p: float = 0.0  # in (0, 1): drop tokens with prob < min_p * max_prob
    #               (sample_token branch order: only when top_k == 0, and it
    #               replaces top-p — reference generation.py:108-115)
    repetition_penalty: float = 1.0  # CTRL penalty >= 1 over this request's
    #               GENERATED tokens (needs enable_rep_penalty; the static
    #               lane penalizes prompt ids too — documented divergence)
    seed: int = 0  # per-request PRNG seed; streams are deterministic
    #               given (seed, prompt) and independent of batchmates
    done: threading.Event = field(default_factory=threading.Event)
    tokens: List[int] = field(default_factory=list)
    first_token: Optional[int] = None


class SlotEngine:
    """Fixed-slot continuous batching over the backbone decode step."""

    def __init__(
        self,
        params: Dict,  # backbone params (the {"mamba": ...} SUBTREE)
        cfg,
        *,
        n_slots: int = 8,
        chunk: int = 16,
        task: str = "mmu",
        dtype=None,
        eos_token_id: Optional[int] = None,
        prefill_bucket: int = 32,
        max_new_default: int = 256,
        scan_impl: str = "auto",
        state_dtype=None,  # pool SSM-state dtype (bf16 = serving default
        #                    at batch>=16, same tradeoff as generate's
        #                    cache_dtype="auto"; None = fp32)
        enable_sampling: bool = False,  # compile the per-slot sampling
        #   chunk (temperature / top-k / top-p / min-p / seed per REQUEST;
        #   measured +3.1% chunk time at 1.3B W=16). Static flag:
        #   the default greedy program is byte-identical to before, and a
        #   greedy request (temperature=0) inside a sampling pool still
        #   takes the argmax branch, so mixed pools stay exact.
        max_top_k: int = 64,  # static top-k width: per-slot k is a runtime
        #   value <= this (one lax.top_k of this width serves every slot).
        #   Per-slot top-p also resolves its nucleus within these candidates
        #   (normalized over the FULL distribution, so the cutoff is exact
        #   whenever the nucleus fits in max_top_k; a wider nucleus truncates
        #   to the top max_top_k tokens — raise max_top_k for flat samplers)
        enable_rep_penalty: bool = False,  # carry a per-slot GENERATED-token
        #   history through the chunk and apply CTRL repetition penalty
        #   (>= 1) to the logits before the pick. Divergence from the static
        #   lane (which penalizes prompt+generated ids): this engine only
        #   sees spliced embeddings, so the penalty covers generated tokens
        #   only. penalty == 1 slots are exact no-ops (identity min-combine).
        history_len: int = 256,  # history capacity per slot when
        #   enable_rep_penalty; requests with penalty != 1 must have
        #   max_new <= this (tokens past it would silently escape penalty)
    ):
        import jax
        import jax.numpy as jnp

        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.chunk = chunk
        self.task = task
        self.dtype = dtype or jnp.bfloat16
        self.eos = eos_token_id
        self.bucket = prefill_bucket
        self.max_new_default = max_new_default
        self.scan_impl = scan_impl
        self.sampling = bool(enable_sampling)
        self.max_top_k = int(max_top_k)
        self.rep_penalty = bool(enable_rep_penalty)
        self.history_len = int(history_len) if enable_rep_penalty else 1

        from omnimamba_tpu.models.backbone import init_backbone_cache

        # host-side slot bookkeeping
        self._active = np.zeros(n_slots, bool)
        self._budget = np.zeros(n_slots, np.int64)  # tokens still allowed
        self._req: List[Optional[_Request]] = [None] * n_slots
        self._queue: List[_Request] = []
        self._lock = threading.Lock()

        # device-side pool state
        self._cache = init_backbone_cache(cfg, n_slots, dtype=self.dtype)
        if state_dtype is not None:
            self._cache = self._cache._replace(
                ssm_state=self._cache.ssm_state.astype(state_dtype)
            )
        self._tok = jnp.zeros((n_slots,), jnp.int32)
        self._pos = jnp.zeros((n_slots,), jnp.int32)
        # per-slot sampling state (inert zeros when sampling is disabled):
        # temperature, top-k width, and a legacy (2,)-uint32 PRNG base key
        # per slot. Tokens are drawn with fold_in(base_key, seq_index), so
        # a slot's stream depends only on its own (seed, positions).
        self._temp = jnp.zeros((n_slots,), jnp.float32)
        self._topk = jnp.zeros((n_slots,), jnp.int32)
        self._topp = jnp.zeros((n_slots,), jnp.float32)
        self._minp = jnp.zeros((n_slots,), jnp.float32)
        self._key = jnp.zeros((n_slots, 2), jnp.uint32)
        # repetition-penalty state: per-slot penalty (1 = off), generated-
        # token history ring ((n_slots, 1) inert when the flag is off) and
        # a count of valid entries. Updated inside the chunk scan; reset at
        # admission (the first generated token seeds position 0).
        self._pen = jnp.ones((n_slots,), jnp.float32)
        self._hist = jnp.zeros((n_slots, self.history_len), jnp.int32)
        self._cnt = jnp.zeros((n_slots,), jnp.int32)

        self._jit: Dict = {}
        self._chunk_fn = jax.jit(self._make_chunk())

    # --- jitted builders ----------------------------------------------------
    def _pick(self, logits, idx, temp, topk, topp, minp, keys):
        """Next-token choice from fp32 ``logits`` (B, V): greedy argmax, or —
        when this slot's ``temp > 0`` — a temperature/top-k/top-p/min-p draw
        keyed by ``fold_in(base_key, idx)`` where ``idx`` is the sequence
        index of the token being PRODUCED (prefill uses vlen, the chunk uses
        pos+1, so the two never collide). Traced only when
        ``enable_sampling``.

        Filter order mirrors ``ops/sampling.sample_token`` (reference
        generation.py:87-121): top-k mask on raw logits, temperature, then
        top-p on the scaled survivors — except when this slot has top_k == 0
        and min_p > 0, where min-p (computed on RAW logits) replaces top-p,
        the reference's branch order. The nucleus is resolved within the
        ``max_top_k`` candidates of the ONE ``lax.top_k`` this path already
        pays for, with probabilities normalized over the full (masked,
        scaled) distribution — exact iff the nucleus fits in ``max_top_k``,
        else truncated to those candidates. Min-p needs no sort at all:
        prob < min_p * max_prob  <=>  logit < max_logit + log(min_p)."""
        import jax
        import jax.numpy as jnp

        greedy = jnp.argmax(logits, -1).astype(jnp.int32)
        if not self.sampling:
            return greedy
        maxk = min(self.max_top_k, logits.shape[-1])
        vals = jax.lax.top_k(logits, maxk)[0]  # (B, maxk) descending
        kth = jnp.take_along_axis(
            vals, (jnp.clip(topk, 1, maxk) - 1)[:, None], axis=1
        )[:, 0]
        use_k = (topk > 0)[:, None]
        use_minp = (~use_k) & ((minp > 0) & (minp < 1))[:, None]
        # one per-ROW cutoff folds top-k and min-p into a single (B, V)
        # compare. min-p survivors come from raw logits:
        # prob >= min_p * max_prob  <=>  logit >= max_logit + log(min_p).
        # The row max MUST come from a fresh jnp.max reduction, NOT from
        # vals[:, :1]: a second consumer of the lax.top_k output measured
        # +10 ms/chunk at 1.3B W=16 (bisect V6-slice vs V6-log/const in the
        # r5 notes; the where-nesting and the log are free).
        minp_cut = jnp.max(logits, -1, keepdims=True) + jnp.log(
            jnp.clip(minp, 1e-9, 1.0)
        )[:, None]
        row_cut = jnp.where(
            use_minp, minp_cut,
            jnp.where(use_k, kth[:, None], -jnp.inf),
        )  # (B, 1)
        keep = logits >= row_cut
        tclamp = jnp.maximum(temp, 1e-6)[:, None]
        scaled = jnp.where(keep, logits, -jnp.inf) / tclamp
        # top-p: the scaled survivors in descending order are exactly `vals`
        # value-masked by the top-k cutoff (ties at the kth value stay kept,
        # matching apply_top_k) — no second full-vocab sort needed.
        svals = jnp.where(use_k & (vals < kth[:, None]), -jnp.inf, vals) / tclamp
        lse = jax.scipy.special.logsumexp(scaled, axis=-1, keepdims=True)
        p_sorted = jnp.exp(svals - lse)  # true probs of the candidates
        cum = jnp.cumsum(p_sorted, axis=-1)
        # keep candidate j iff the mass strictly ABOVE it is < top_p
        # (the apply_top_p rule re-stated on a descending order)
        keep_p = (cum - p_sorted) < topp[:, None]
        cut = jnp.min(jnp.where(keep_p, svals, jnp.inf), axis=-1)
        use_p = ((topp > 0) & (topp < 1))[:, None] & ~use_minp
        nucleus = jnp.where(use_p & (scaled < cut[:, None]), -jnp.inf, scaled)
        sampled = jax.vmap(
            lambda k, i, row: jax.random.categorical(
                jax.random.fold_in(k, i), row
            )
        )(keys, idx, nucleus).astype(jnp.int32)
        return jnp.where(temp > 0, sampled, greedy)

    def _penalize(self, logits, hist, cnt, pen):
        """CTRL repetition penalty over this slot's GENERATED tokens (the
        ops/sampling.apply_repetition_penalty scatter, vectorized to a
        per-slot penalty). Engine validation pins pen >= 1, so the penalized
        score is always <= the original and one ``.min`` scatter serves every
        slot; pen == 1 rows write the unchanged score (exact no-op). Entries
        past ``cnt`` write +inf (the min identity). Traced only when
        ``enable_rep_penalty``."""
        import jax.numpy as jnp

        if not self.rep_penalty:
            return logits
        B, H = hist.shape
        scores = jnp.take_along_axis(logits, hist, axis=1)  # (B, H)
        p = pen[:, None]
        pscores = jnp.where(scores < 0, scores * p, scores / p)
        valid = jnp.arange(H)[None, :] < cnt[:, None]
        pscores = jnp.where(valid, pscores, jnp.inf)
        return logits.at[jnp.arange(B)[:, None], hist].min(pscores)

    def _make_chunk(self):
        import jax
        import jax.numpy as jnp

        from omnimamba_tpu.models.backbone import apply_head, backbone_step

        K, task, cfg, dtype = self.chunk, self.task, self.cfg, self.dtype
        H = self.history_len

        def chunk(params, cache, tok, pos, temp, topk, topp, minp, keys,
                  hist, cnt, pen):
            def body(carry, _):
                tok, pos, cache, hist, cnt = carry
                hidden, cache = backbone_step(
                    params, tok, pos, cache, task, cfg, dtype=dtype
                )
                logits = apply_head(params, hidden, task).astype(jnp.float32)
                logits = self._penalize(logits, hist, cnt, pen)
                nxt = self._pick(logits, pos + 1, temp, topk, topp, minp, keys)
                if self.rep_penalty:
                    B = hist.shape[0]
                    hist = hist.at[
                        jnp.arange(B), jnp.clip(cnt, 0, H - 1)
                    ].set(nxt)
                    cnt = jnp.minimum(cnt + 1, H)
                return (nxt, pos + 1, cache, hist, cnt), nxt

            (tok, pos, cache, hist, cnt), toks = jax.lax.scan(
                body, (tok, pos, cache, hist, cnt), None, length=K
            )
            return toks.T, cache, tok, pos, hist, cnt  # toks: (B, K)

        return chunk

    def _insert_fn(self, m_pref: int):
        """Scatter ``m_pref`` rows of an ``m_pref``-wide prefill result into
        the pool in ONE program. Keyed by m_pref alone (a power of two
        <= 2*n_slots), so there are at most log2(n_slots)+1 compile
        variants; callers PAD the (idx, slot, pos) vectors to ``m_pref`` by
        repeating a live tuple — duplicate scatter indices then all carry
        the identical row, so write order is irrelevant."""
        import jax
        import jax.numpy as jnp

        key = ("insert", m_pref)
        if key not in self._jit:

            def insert(cache, rows, idx, slots, tok, pos, firsts, rposs,
                       temp, rtemp, topk, rtopk, topp, rtopp,
                       minp, rminp, keys, rkeys, hist, cnt, pen, rpen):
                # cache: (n_layer, n_slots, ...); rows: (n_layer, m_pref, ...)
                def put(full, row):
                    return full.at[:, slots].set(
                        jnp.take(row, idx, axis=1).astype(full.dtype)
                    )

                new_cache = jax.tree.map(put, cache, rows)
                return (
                    new_cache,
                    tok.at[slots].set(jnp.take(firsts, idx).astype(jnp.int32)),
                    pos.at[slots].set(rposs.astype(jnp.int32)),
                    # rtemp/rtopk/rtopp/rkeys are host-aligned with ``slots``
                    # (like rposs), not with the prefill rows
                    temp.at[slots].set(rtemp),
                    topk.at[slots].set(rtopk),
                    topp.at[slots].set(rtopp),
                    minp.at[slots].set(rminp),
                    keys.at[slots].set(rkeys),
                    # history restarts with the prefill's first generated
                    # token at position 0 (count = 1)
                    hist.at[slots].set(0).at[slots, 0].set(
                        jnp.take(firsts, idx).astype(jnp.int32)
                    ),
                    cnt.at[slots].set(1),
                    pen.at[slots].set(rpen),
                )

            self._jit[key] = jax.jit(insert)
        return self._jit[key]

    def _prefill_fn(self, L: int, M: int):
        """Batched admission prefill: M rows of bucket length L in one
        program (padding rows carry vlen=1 and are discarded)."""
        import jax
        import jax.numpy as jnp

        key = ("prefill", L, M)
        if key not in self._jit:
            from omnimamba_tpu.models.backbone import apply_head, backbone_forward

            task, cfg, scan_impl = self.task, self.cfg, self.scan_impl

            def prefill(params, emb, vlen, temp, topk, topp, minp, keys):
                hidden, cache = backbone_forward(
                    params, emb, task, cfg, scan_impl=scan_impl,
                    return_cache=True, valid_len=vlen,
                )
                last = jnp.take_along_axis(
                    hidden, (vlen - 1).reshape(-1, 1, 1).astype(jnp.int32), axis=1
                )[:, 0]
                logits = apply_head(params, last, task).astype(jnp.float32)
                # first generated token sits at sequence index vlen
                first = self._pick(logits, vlen, temp, topk, topp, minp, keys)
                # state dtype must match the pool cache
                cache = cache._replace(
                    ssm_state=cache.ssm_state.astype(self._cache.ssm_state.dtype)
                )
                return cache, first

            self._jit[key] = jax.jit(prefill)
        return self._jit[key]

    # --- host API -------------------------------------------------------
    def warmup(self, prompt_lens) -> None:
        """EXECUTE every program traffic with these prompt lengths can hit
        (chunk step; per-bucket prefill at each power-of-two admission
        width; per-width insert) on dummy inputs, discarding results — the
        pool is functional state, so nothing mutates. Call once at server
        startup so the first requests don't pay multi-second compiles
        (measured: cold variants turned a 6 s serving window into 28 s;
        AOT ``.lower().compile()`` does NOT prime jit's execution cache on
        the axon backend — only execution does)."""
        import jax
        import jax.numpy as jnp

        def sync(x):
            np.asarray(jax.tree.leaves(x)[-1].ravel()[-1])  # axon-safe block

        sync(self._chunk_fn(self.params, self._cache, self._tok, self._pos,
                            self._temp, self._topk, self._topp, self._minp,
                            self._key, self._hist, self._cnt, self._pen))

        d = int(self.cfg.d_model)
        buckets = sorted(
            {-(-max(int(L), 1) // self.bucket) * self.bucket for L in prompt_lens}
        )
        M = 1
        while True:
            vec = jnp.zeros((M,), jnp.int32)
            ftem = jnp.zeros((M,), jnp.float32)
            fkey = jnp.zeros((M, 2), jnp.uint32)
            rows = jax.tree.map(
                lambda x: jnp.zeros((x.shape[0], M) + x.shape[2:], x.dtype),
                self._cache,
            )
            sync(self._insert_fn(M)(
                self._cache, rows, vec, vec, self._tok, self._pos, vec, vec,
                self._temp, ftem, self._topk, vec, self._topp, ftem,
                self._minp, ftem, self._key, fkey,
                self._hist, self._cnt, self._pen, jnp.ones((M,), jnp.float32),
            ))
            for Lb in buckets:
                sync(self._prefill_fn(Lb, M)(
                    self.params, jnp.zeros((M, Lb, d), self.dtype),
                    jnp.ones((M,), jnp.int32), ftem, vec, ftem, ftem, fkey,
                ))
            if M >= self.n_slots:
                break
            M <<= 1

    def submit(
        self, emb: np.ndarray, prompt_len: int, max_new: Optional[int] = None,
        *, temperature: float = 0.0, top_k: int = 0, top_p: float = 0.0,
        min_p: float = 0.0, repetition_penalty: float = 1.0, seed: int = 0,
    ):
        """Queue one request (spliced (L, d) embeddings + true length).
        ``temperature=0`` is exact greedy; ``temperature>0`` draws with
        optional ``top_k``/``top_p``/``min_p`` (k <= the engine's
        ``max_top_k``; the top-p nucleus resolves within those candidates;
        min-p applies only when top_k == 0, replacing top-p — the
        sample_token branch order) from the per-request ``seed``
        (requires ``enable_sampling=True``).
        Returns the _Request; wait on .done then read .tokens."""
        if temperature > 0 and not self.sampling:
            raise ValueError(
                "temperature > 0 needs SlotEngine(enable_sampling=True)"
            )
        if top_k > self.max_top_k:
            raise ValueError(f"top_k {top_k} > engine max_top_k {self.max_top_k}")
        if not 0.0 <= top_p < 1.0:
            raise ValueError(f"top_p {top_p} must be in [0, 1)")
        if not 0.0 <= min_p < 1.0:
            raise ValueError(f"min_p {min_p} must be in [0, 1)")
        if repetition_penalty != 1.0:
            if not self.rep_penalty:
                raise ValueError(
                    "repetition_penalty != 1 needs "
                    "SlotEngine(enable_rep_penalty=True)"
                )
            if repetition_penalty < 1.0:
                raise ValueError(
                    f"repetition_penalty {repetition_penalty} must be >= 1 "
                    "(amplification < 1 is not supported by this engine)"
                )
            if int(max_new or self.max_new_default) > self.history_len:
                raise ValueError(
                    f"max_new {max_new} > history_len {self.history_len}: "
                    "tokens past the history would escape the penalty"
                )
        req = _Request(
            emb=np.asarray(emb), prompt_len=int(prompt_len),
            max_new=int(max_new or self.max_new_default),
            temperature=float(temperature), top_k=int(top_k),
            top_p=float(top_p), min_p=float(min_p),
            repetition_penalty=float(repetition_penalty), seed=int(seed),
        )
        with self._lock:
            self._queue.append(req)
        return req

    def _admit(self):
        """Admit queued requests into free slots. Admissions are BATCHED:
        queued requests with the same bucketed prompt length prefill in one
        (M, Lb) program (M padded to a power of two to bound compile
        variants) and their rows scatter into the pool in one insert — the
        per-request dispatch cost that dominated the solo-admission design
        (~60 ms/request on the tunnel) amortizes M ways."""
        import jax.numpy as jnp

        while True:
            with self._lock:
                free = [i for i in range(self.n_slots) if not self._active[i]]
                take = min(len(free), len(self._queue))
                if take == 0:
                    return
                batch = [self._queue.pop(0) for _ in range(take)]
                slots = free[:take]
                for s, r in zip(slots, batch):
                    self._active[s] = True
                    self._req[s] = r

            groups: Dict[int, list] = {}
            for s, r in zip(slots, batch):
                Lb = -(-max(r.emb.shape[0], 1) // self.bucket) * self.bucket
                groups.setdefault(Lb, []).append((s, r))

            any_finished = False
            for Lb, items in groups.items():
                M = len(items)
                Mb = 1 << (M - 1).bit_length()  # pad to pow2: bounded compiles
                d = items[0][1].emb.shape[1]
                emb = np.zeros((Mb, Lb, d), np.float32)
                vlen = np.ones((Mb,), np.int32)
                rtemp = np.zeros((Mb,), np.float32)
                rtopk = np.zeros((Mb,), np.int32)
                rtopp = np.zeros((Mb,), np.float32)
                rminp = np.zeros((Mb,), np.float32)
                rpen = np.ones((Mb,), np.float32)
                rkeys = np.zeros((Mb, 2), np.uint32)
                import jax

                for j, (_, r) in enumerate(items):
                    emb[j, : r.emb.shape[0]] = r.emb
                    vlen[j] = r.prompt_len
                    rtemp[j] = r.temperature
                    rtopk[j] = r.top_k
                    rtopp[j] = r.top_p
                    rminp[j] = r.min_p
                    rpen[j] = r.repetition_penalty
                    if r.temperature > 0:
                        rkeys[j] = np.asarray(jax.random.PRNGKey(r.seed))
                rows, firsts = self._prefill_fn(Lb, Mb)(
                    self.params, jnp.asarray(emb, self.dtype), jnp.asarray(vlen),
                    jnp.asarray(rtemp), jnp.asarray(rtopk), jnp.asarray(rtopp),
                    jnp.asarray(rminp), jnp.asarray(rkeys),
                )
                firsts_h = np.asarray(firsts)  # one sync per group

                live = []
                for j, (s, r) in enumerate(items):
                    ft = int(firsts_h[j])
                    r.first_token = ft
                    r.tokens.append(ft)
                    self._budget[s] = r.max_new - 1
                    if (self.eos is not None and ft == self.eos) or self._budget[
                        s
                    ] <= 0:
                        self._finish(s)
                        any_finished = True
                    else:
                        live.append(j)
                if live:
                    # pad the scatter vectors to Mb by repeating the first
                    # live tuple: duplicates write the identical value, and
                    # the insert program compiles once per Mb.
                    pad = [live[0]] * (Mb - len(live))
                    lv = live + pad
                    idx = jnp.asarray(np.asarray(lv, np.int32))
                    lslots = jnp.asarray(
                        np.asarray([items[j][0] for j in lv], np.int32)
                    )
                    rposs = jnp.asarray(
                        np.asarray(
                            [items[j][1].prompt_len for j in lv], np.int32
                        )
                    )
                    (
                        self._cache, self._tok, self._pos,
                        self._temp, self._topk, self._topp, self._minp,
                        self._key, self._hist, self._cnt, self._pen,
                    ) = self._insert_fn(Mb)(
                        self._cache, rows, idx, lslots, self._tok, self._pos,
                        firsts, rposs,
                        self._temp, jnp.asarray(rtemp[np.asarray(lv)]),
                        self._topk, jnp.asarray(rtopk[np.asarray(lv)]),
                        self._topp, jnp.asarray(rtopp[np.asarray(lv)]),
                        self._minp, jnp.asarray(rminp[np.asarray(lv)]),
                        self._key, jnp.asarray(rkeys[np.asarray(lv)]),
                        self._hist, self._cnt, self._pen,
                        jnp.asarray(rpen[np.asarray(lv)]),
                    )
            if not any_finished:
                return  # no slots freed mid-admission; nothing more to do

    def _finish(self, slot: int):
        req = self._req[slot]
        self._active[slot] = False
        self._req[slot] = None
        if req is not None:
            req.done.set()

    def tick(self) -> int:
        """One engine iteration: admit -> decode one chunk -> harvest.
        Returns the number of ACTIVE slots that advanced (0 = idle)."""
        self._admit()
        n_active = int(self._active.sum())
        if n_active == 0:
            return 0
        (toks, self._cache, self._tok, self._pos, self._hist,
         self._cnt) = self._chunk_fn(
            self.params, self._cache, self._tok, self._pos,
            self._temp, self._topk, self._topp, self._minp, self._key,
            self._hist, self._cnt, self._pen,
        )
        toks_h = np.asarray(toks)  # ONE host sync per chunk
        for slot in range(self.n_slots):
            if not self._active[slot]:
                continue
            req = self._req[slot]
            for t in toks_h[slot]:
                t = int(t)
                if self._budget[slot] <= 0:
                    break
                req.tokens.append(t)
                self._budget[slot] -= 1
                if self.eos is not None and t == self.eos:
                    break
            if (
                self._budget[slot] <= 0
                or (self.eos is not None and self.eos in req.tokens)
            ):
                # trim anything past eos
                if self.eos is not None and self.eos in req.tokens:
                    req.tokens[:] = req.tokens[: req.tokens.index(self.eos) + 1]
                self._finish(slot)
        return n_active

    def run_until_drained(self, max_ticks: int = 10_000) -> None:
        for _ in range(max_ticks):
            with self._lock:
                idle = not self._queue and not self._active.any()
            if idle:
                return
            self.tick()
        raise RuntimeError("engine did not drain")
