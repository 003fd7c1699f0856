"""Continuous-batching slot engine: every request's stream must be
bit-identical to its solo ``generate()`` greedy stream, including requests
admitted MID-FLIGHT into a pool that is already decoding others (the whole
point of the engine — admission must not perturb in-flight slots)."""

import jax
import jax.numpy as jnp
import numpy as np

from omnimamba_tpu.models.backbone import embed_text, init_backbone
from omnimamba_tpu.models.generation import generate
from omnimamba_tpu.ops.sampling import SampleParams
from omnimamba_tpu.serve.continuous import SlotEngine
from tests.test_backbone import tiny_config


def _solo_stream(params, cfg, ids, max_new):
    emb = embed_text(params, ids[None], jnp.float32)
    out = generate(
        params, cfg, input_ids=jnp.asarray(ids[None]), input_embeddings=emb,
        task="mmu", max_length=len(ids) + max_new,
        sample=SampleParams(top_k=1), scan_impl="chunked", cache_dtype=None,
    )
    return np.asarray(out.sequences)[0, len(ids):].tolist()


def _mk():
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    prompts = [
        rng.integers(0, cfg.vocab_size, n).astype(np.int32)
        for n in (5, 9, 17, 3, 12)
    ]
    return cfg, params, prompts


def test_streams_match_solo_generate():
    cfg, params, prompts = _mk()
    eng = SlotEngine(
        params, cfg, n_slots=3, chunk=4, task="mmu", dtype=jnp.float32,
        prefill_bucket=8, max_new_default=11, scan_impl="chunked",
    )
    reqs = []
    for p in prompts:
        emb = np.asarray(embed_text(params, jnp.asarray(p[None]), jnp.float32))[0]
        reqs.append(eng.submit(emb, len(p), max_new=11))
    eng.run_until_drained()
    for p, r in zip(prompts, reqs):
        assert r.done.is_set()
        want = _solo_stream(params, cfg, p, 11)
        assert r.tokens == want, (r.tokens, want)


def test_midflight_admission_does_not_perturb():
    """Admit a second request while the first is mid-decode: the first
    request's remaining tokens must be unchanged vs its solo stream."""
    cfg, params, prompts = _mk()
    eng = SlotEngine(
        params, cfg, n_slots=2, chunk=3, task="mmu", dtype=jnp.float32,
        prefill_bucket=8, max_new_default=13, scan_impl="chunked",
    )
    emb0 = np.asarray(embed_text(params, jnp.asarray(prompts[0][None]), jnp.float32))[0]
    r0 = eng.submit(emb0, len(prompts[0]), max_new=13)
    eng.tick()  # r0 admitted + 3 tokens decoded
    assert not r0.done.is_set()
    emb1 = np.asarray(embed_text(params, jnp.asarray(prompts[1][None]), jnp.float32))[0]
    r1 = eng.submit(emb1, len(prompts[1]), max_new=13)
    eng.run_until_drained()
    assert r0.tokens == _solo_stream(params, cfg, prompts[0], 13)
    assert r1.tokens == _solo_stream(params, cfg, prompts[1], 13)


def test_batched_admission_same_bucket_matches_solo():
    """Four requests whose prompts all land in the SAME length bucket admit
    together as one (M=4, Lb) prefill group + one scatter insert; every
    stream must still match its solo decode (padding rows and grouped
    scatter must not perturb numerics)."""
    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(11)
    prompts = [
        rng.integers(0, cfg.vocab_size, n).astype(np.int32) for n in (5, 3, 7, 2)
    ]
    eng = SlotEngine(
        params, cfg, n_slots=4, chunk=4, task="mmu", dtype=jnp.float32,
        prefill_bucket=8, max_new_default=9, scan_impl="chunked",
    )
    reqs = []
    for p in prompts:
        emb = np.asarray(embed_text(params, jnp.asarray(p[None]), jnp.float32))[0]
        reqs.append(eng.submit(emb, len(p), max_new=9))
    eng.run_until_drained()
    assert ("prefill", 8, 4) in eng._jit  # the group really was batched
    for p, r in zip(prompts, reqs):
        assert r.tokens == _solo_stream(params, cfg, p, 9)


def test_eos_frees_slot_and_truncates():
    """A forced-eos vocabulary row: when eos appears the slot frees and the
    stream is truncated at (and including) eos."""
    cfg, params, prompts = _mk()
    # find the eos the model actually emits: run solo and take token 2
    want = _solo_stream(params, cfg, prompts[0], 9)
    eos = want[2]
    eng = SlotEngine(
        params, cfg, n_slots=2, chunk=4, task="mmu", dtype=jnp.float32,
        prefill_bucket=8, eos_token_id=eos, scan_impl="chunked",
    )
    emb = np.asarray(embed_text(params, jnp.asarray(prompts[0][None]), jnp.float32))[0]
    r = eng.submit(emb, len(prompts[0]), max_new=9)
    eng.run_until_drained()
    assert r.tokens == want[:3]
    assert r.tokens[-1] == eos
    assert not eng._active.any()


def _embed_row(params, p):
    return np.asarray(embed_text(params, jnp.asarray(p[None]), jnp.float32))[0]


def test_sampling_pool_greedy_requests_stay_exact():
    """enable_sampling=True compiles the sampling chunk; a temperature=0
    request through it must still be bit-identical to its solo greedy
    stream (the argmax branch of the jnp.where)."""
    cfg, params, prompts = _mk()
    eng = SlotEngine(
        params, cfg, n_slots=3, chunk=4, task="mmu", dtype=jnp.float32,
        prefill_bucket=8, max_new_default=9, scan_impl="chunked",
        enable_sampling=True,
    )
    reqs = [eng.submit(_embed_row(params, p), len(p), max_new=9)
            for p in prompts[:3]]
    eng.run_until_drained()
    for p, r in zip(prompts, reqs):
        assert r.tokens == _solo_stream(params, cfg, p, 9)


def test_sampling_deterministic_per_seed_and_varies_across_seeds():
    """A sampled request is a pure function of (seed, prompt): the same
    seed re-submitted (even with DIFFERENT batchmates) repeats its stream
    exactly; distinct seeds at high temperature diverge."""
    cfg, params, prompts = _mk()

    def run(seeds, mates):
        eng = SlotEngine(
            params, cfg, n_slots=4, chunk=4, task="mmu", dtype=jnp.float32,
            prefill_bucket=8, max_new_default=12, scan_impl="chunked",
            enable_sampling=True,
        )
        reqs = [
            eng.submit(_embed_row(params, prompts[0]), len(prompts[0]),
                       max_new=12, temperature=2.0, seed=s)
            for s in seeds
        ]
        for m in mates:  # extra greedy traffic to perturb slot layout
            eng.submit(_embed_row(params, prompts[m]), len(prompts[m]),
                       max_new=12)
        eng.run_until_drained()
        return [r.tokens for r in reqs]

    a = run([5, 6], mates=[])
    b = run([5], mates=[1, 2, 3])
    assert a[0] == b[0], "same seed must repeat regardless of batchmates"
    assert a[0] != a[1], "distinct seeds should diverge at temperature 2"


def test_sampling_respects_top_k():
    """Teacher-forced replay: every sampled token must sit in the top-k set
    of the logits at its position."""
    from omnimamba_tpu.models.backbone import apply_head, backbone_forward

    cfg, params, prompts = _mk()
    p = prompts[2]
    k = 3
    eng = SlotEngine(
        params, cfg, n_slots=2, chunk=4, task="mmu", dtype=jnp.float32,
        prefill_bucket=8, max_new_default=10, scan_impl="chunked",
        enable_sampling=True,
    )
    r = eng.submit(_embed_row(params, p), len(p), max_new=10,
                   temperature=1.5, top_k=k, seed=9)
    eng.run_until_drained()
    full = np.concatenate([p, np.asarray(r.tokens, np.int32)])
    emb = embed_text(params, jnp.asarray(full[None]), jnp.float32)
    hid, _ = backbone_forward(params, emb, "mmu", cfg, scan_impl="chunked")
    logits = np.asarray(apply_head(params, hid, "mmu").astype(jnp.float32))[0]
    for i, t in enumerate(r.tokens):
        row = logits[len(p) - 1 + i]
        topk = np.argsort(row)[::-1][:k]
        assert t in topk, (i, t, topk.tolist())


def test_sampling_respects_top_p():
    """Teacher-forced replay: every sampled token must sit inside the
    top-p nucleus (apply_top_k -> /temperature -> apply_top_p, the static
    sample_token order) of the logits at its position."""
    from omnimamba_tpu.models.backbone import apply_head, backbone_forward
    from omnimamba_tpu.ops.sampling import apply_top_p

    cfg, params, prompts = _mk()
    p = prompts[1]
    temp, topp = 1.5, 0.6
    eng = SlotEngine(
        params, cfg, n_slots=2, chunk=4, task="mmu", dtype=jnp.float32,
        prefill_bucket=16, max_new_default=10, scan_impl="chunked",
        enable_sampling=True,
    )
    r = eng.submit(_embed_row(params, p), len(p), max_new=10,
                   temperature=temp, top_p=topp, seed=3)
    eng.run_until_drained()
    full = np.concatenate([p, np.asarray(r.tokens, np.int32)])
    emb = embed_text(params, jnp.asarray(full[None]), jnp.float32)
    hid, _ = backbone_forward(params, emb, "mmu", cfg, scan_impl="chunked")
    logits = np.asarray(apply_head(params, hid, "mmu").astype(jnp.float32))[0]
    for i, t in enumerate(r.tokens):
        row = jnp.asarray(logits[len(p) - 1 + i]) / temp
        kept = np.asarray(apply_top_p(row[None], topp))[0]
        assert np.isfinite(kept[t]), (i, t, int(np.isfinite(kept).sum()))


def test_sampling_respects_min_p():
    """Teacher-forced replay: with top_k=0 and min_p set, every sampled
    token's RAW-logit probability must be >= min_p * max_prob (min-p is
    computed before temperature, reference generation.py:108-115)."""
    from omnimamba_tpu.models.backbone import apply_head, backbone_forward

    cfg, params, prompts = _mk()
    p = prompts[3]
    minp = 0.25
    eng = SlotEngine(
        params, cfg, n_slots=2, chunk=4, task="mmu", dtype=jnp.float32,
        prefill_bucket=8, max_new_default=10, scan_impl="chunked",
        enable_sampling=True,
    )
    r = eng.submit(_embed_row(params, p), len(p), max_new=10,
                   temperature=2.0, min_p=minp, seed=11)
    eng.run_until_drained()
    full = np.concatenate([p, np.asarray(r.tokens, np.int32)])
    emb = embed_text(params, jnp.asarray(full[None]), jnp.float32)
    hid, _ = backbone_forward(params, emb, "mmu", cfg, scan_impl="chunked")
    logits = np.asarray(apply_head(params, hid, "mmu").astype(jnp.float32))[0]
    for i, t in enumerate(r.tokens):
        row = logits[len(p) - 1 + i]
        probs = np.exp(row - row.max())
        probs /= probs.sum()
        assert probs[t] >= minp * probs.max() - 1e-7, (i, t, probs[t])


def test_rep_penalty_one_stays_exact_and_flags_validated():
    """penalty=1 requests through a penalty-enabled engine must stay
    bit-identical to solo greedy (the min-combine writes the unchanged
    score); penalty != 1 without the flag / < 1 / past history must raise."""
    import pytest

    cfg, params, prompts = _mk()
    eng = SlotEngine(
        params, cfg, n_slots=3, chunk=4, task="mmu", dtype=jnp.float32,
        prefill_bucket=8, max_new_default=9, scan_impl="chunked",
        enable_rep_penalty=True, history_len=16,
    )
    reqs = [eng.submit(_embed_row(params, p), len(p), max_new=9)
            for p in prompts[:3]]
    eng.run_until_drained()
    for p, r in zip(prompts, reqs):
        assert r.tokens == _solo_stream(params, cfg, p, 9)
    with pytest.raises(ValueError):
        eng.submit(_embed_row(params, prompts[0]), len(prompts[0]),
                   repetition_penalty=0.9)
    with pytest.raises(ValueError):
        eng.submit(_embed_row(params, prompts[0]), len(prompts[0]),
                   max_new=17, repetition_penalty=1.3)
    plain = SlotEngine(params, cfg, n_slots=2, chunk=4, task="mmu",
                       dtype=jnp.float32, prefill_bucket=8,
                       scan_impl="chunked")
    with pytest.raises(ValueError):
        plain.submit(_embed_row(params, prompts[0]), len(prompts[0]),
                     repetition_penalty=1.3)


def test_rep_penalty_matches_teacher_forced_oracle():
    """Greedy + penalty>1: the engine's stream must equal a host replay that
    penalizes each step's logits over the GENERATED-so-far tokens (the
    engine's documented semantics — prompt ids are embeddings here and are
    not penalized, unlike the static lane)."""
    from omnimamba_tpu.models.backbone import apply_head, backbone_forward
    from omnimamba_tpu.ops.sampling import apply_repetition_penalty

    cfg, params, prompts = _mk()
    p = prompts[0]
    pen, n_new = 1.8, 10
    eng = SlotEngine(
        params, cfg, n_slots=2, chunk=4, task="mmu", dtype=jnp.float32,
        prefill_bucket=8, max_new_default=n_new, scan_impl="chunked",
        enable_rep_penalty=True, history_len=16,
    )
    r = eng.submit(_embed_row(params, p), len(p), max_new=n_new,
                   repetition_penalty=pen)
    eng.run_until_drained()
    assert len(r.tokens) == n_new

    got = []
    for _ in range(n_new):
        full = np.concatenate([p, np.asarray(got, np.int32)])
        emb = embed_text(params, jnp.asarray(full[None]), jnp.float32)
        hid, _ = backbone_forward(params, emb, "mmu", cfg,
                                  scan_impl="chunked")
        logits = apply_head(params, hid, "mmu").astype(jnp.float32)[:, -1]
        if got:
            logits = apply_repetition_penalty(
                logits, jnp.asarray(np.asarray(got, np.int32)[None]), pen
            )
        got.append(int(np.asarray(jnp.argmax(logits, -1))[0]))
    assert r.tokens == got, (r.tokens, got)
    # sanity: the penalty actually changed the stream vs plain greedy
    assert r.tokens != _solo_stream(params, cfg, p, n_new)


def test_sampling_rejected_without_flag_and_over_max_k():
    cfg, params, prompts = _mk()
    eng = SlotEngine(params, cfg, n_slots=2, chunk=4, task="mmu",
                     dtype=jnp.float32, prefill_bucket=8, scan_impl="chunked")
    import pytest

    with pytest.raises(ValueError):
        eng.submit(_embed_row(params, prompts[0]), len(prompts[0]),
                   temperature=1.0)
    eng2 = SlotEngine(params, cfg, n_slots=2, chunk=4, task="mmu",
                      dtype=jnp.float32, prefill_bucket=8,
                      scan_impl="chunked", enable_sampling=True)
    with pytest.raises(ValueError):
        eng2.submit(_embed_row(params, prompts[0]), len(prompts[0]),
                    temperature=1.0, top_k=65)
    with pytest.raises(ValueError):
        eng2.submit(_embed_row(params, prompts[0]), len(prompts[0]),
                    temperature=1.0, top_p=1.0)


def test_http_continuous_lane_matches_static_batcher():
    """Full-stack: make_server(continuous_mmu=True) answers /v1/mmu through
    the slot engine, tagged lane=continuous, with text equal to the static
    batcher's greedy answer for the same request."""
    import base64
    import io as _io
    import json as _json
    import threading
    import urllib.request

    from PIL import Image

    from omnimamba_tpu.data.prompting import UniversalPrompting
    from omnimamba_tpu.data.tokenizer import OfflineTokenizer
    from omnimamba_tpu.models.omnimamba import init_omnimamba
    from omnimamba_tpu.serve.server import OmniMambaService, make_server
    from tests.test_omnimamba import tiny_model

    model = tiny_model()
    params = init_omnimamba(jax.random.PRNGKey(0), model)
    uni = UniversalPrompting(OfflineTokenizer(base_vocab=49))
    model = model._replace(
        sptids={k: v % model.cfg.vocab_size for k, v in uni.sptids_dict.items()}
    )
    service = OmniMambaService(
        model, params, uni, t2i_batch=2, mmu_batch=2, mmu_max_new=6,
        dtype=jnp.float32, cache_dtype=None,
    )

    def post(url, obj):
        req = urllib.request.Request(
            url, data=_json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return _json.loads(r.read())

    buf = _io.BytesIO()
    Image.fromarray(
        (np.random.default_rng(5).random((28, 28, 3)) * 255).astype(np.uint8)
    ).save(buf, format="PNG")
    q = {"image_png_b64": base64.b64encode(buf.getvalue()).decode(),
         "question": "what is it"}

    # static batcher answer
    srv_a = make_server(service, host="127.0.0.1", port=0)
    ta = threading.Thread(target=srv_a.serve_forever, daemon=True)
    ta.start()
    base_a = f"http://127.0.0.1:{srv_a.server_address[1]}"
    static = post(base_a + "/v1/mmu", q)
    srv_a.shutdown(); srv_a.server_close(); srv_a.stop_batchers(); ta.join(5)

    # continuous lane answer — two concurrent requests to exercise admission
    srv_b = make_server(
        service, host="127.0.0.1", port=0,
        continuous_mmu=True, continuous_slots=2, continuous_chunk=3,
    )
    tb = threading.Thread(target=srv_b.serve_forever, daemon=True)
    tb.start()
    base_b = f"http://127.0.0.1:{srv_b.server_address[1]}"
    results = [None, None]

    def call(i):
        results[i] = post(base_b + "/v1/mmu", q)

    ts = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=300) for t in ts]
    srv_b.shutdown(); srv_b.server_close(); srv_b.stop_batchers(); tb.join(5)

    for res in results:
        assert res["lane"] == "continuous"
        assert res["text"] == static["text"]
