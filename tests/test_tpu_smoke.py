"""Hardware lowering smoke tests for every Pallas kernel.

The regular suite runs the kernels in INTERPRET mode on CPU, which
validates semantics but not Mosaic lowering — a Pallas version bump once
broke the factored word-graph kernel on real TPUs (rank-1 SMEM block
rule) while the whole interpret suite stayed green. These tests compile
and run each kernel on the actual accelerator and are skipped unless one
is attached:

    JAX_PLATFORMS='' python -m pytest tests/test_tpu_smoke.py -q

(The main conftest pins the CPU backend, so on a TPU host run this file
with the platform pin removed, or via ``python tests/test_tpu_smoke.py``
which re-execs without the pin.)
"""

import os
import sys

if __name__ == "__main__":  # direct run: drop the conftest CPU pin
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ}
    env.pop("JAX_PLATFORMS", None)  # let the TPU plugin win
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    sys.exit(subprocess.call(
        [sys.executable, "-m", "pytest", __file__, "-q",
         "-p", "no:cacheprovider", "--noconftest"],
        env=env,
    ))

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware lowering smoke test: needs a real TPU backend",
)


def _rng():
    return np.random.default_rng(0)


def test_fused_mfcc_frontend_lowers_and_matches_xla():
    from lnasr_tpu.config import MFCCConfig
    from lnasr_tpu.models.mfcc import mfcc_features, mfcc_features_fused

    cfg = MFCCConfig(energy_floor=1e-10)
    sig = jnp.asarray(
        _rng().normal(scale=3000.0, size=(2, 8000)).astype(np.float32)
    )
    fused, _ = mfcc_features_fused(sig, cfg, dtype=jnp.float32)
    ref = jax.vmap(
        lambda s: mfcc_features(s, cfg, dtype=jnp.float32).features
    )(sig)
    err = float(jnp.max(jnp.abs(fused - ref)))
    assert err < 0.1, f"fused-vs-XLA feature err {err}"


def test_small_n_viterbi_kernel_lowers():
    from lnasr_tpu.ops.trellis import viterbi_scan
    from lnasr_tpu.ops.trellis_pallas import viterbi_pallas

    rng = _rng()
    for n in (5, 12):
        log_a = jnp.asarray(np.log(rng.dirichlet(np.ones(n), size=n)), jnp.float32)
        log_pi = jnp.asarray(np.log(rng.dirichlet(np.ones(n))), jnp.float32)
        log_b = jnp.asarray(rng.normal(size=(3, 40, n)).astype(np.float32))
        path, score = viterbi_pallas(log_pi, log_a, log_b)
        ref = jax.vmap(lambda lb: viterbi_scan(log_pi, log_a, lb))(log_b)
        np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))


def test_dense_viterbi_kernel_lowers():
    from lnasr_tpu.ops.trellis import viterbi_scan
    from lnasr_tpu.ops.trellis_pallas import viterbi_pallas_dense

    rng = _rng()
    n, t = 300, 50
    log_a = jnp.asarray(np.log(rng.dirichlet(np.ones(n), size=n)), jnp.float32)
    log_pi = jnp.asarray(np.log(rng.dirichlet(np.ones(n))), jnp.float32)
    log_b = jnp.asarray(rng.normal(size=(t, n)).astype(np.float32))
    path, score = viterbi_pallas_dense(log_pi, log_a, log_b)
    ref = viterbi_scan(log_pi, log_a, log_b)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))


def test_factored_forward_kernel_lowers():
    """The kernel the JAX version bump broke: masked + unmasked."""
    from lnasr_tpu.ops.factored_pallas import factored_forward_pallas

    rng = _rng()
    v, s, t = 20, 3, 40
    pi = np.full((v, s), -1e30, np.float32)
    pi[:, 0] = np.log(1.0 / v)
    inner = np.full((v, s, s), -1e30, np.float32)
    for j in range(s):
        inner[:, j, j] = np.log(0.5)
        if j + 1 < s:
            inner[:, j, j + 1] = np.log(0.5)
    exit_idx = np.full(v, s - 1, np.int64)
    hop = np.log(np.ones((v, v), np.float32) / v)
    log_b = rng.normal(size=(t, v, s)).astype(np.float32)
    mask = np.ones(t, bool)
    mask[-6:] = False

    grids = factored_forward_pallas(
        jnp.asarray(pi), jnp.asarray(inner), jnp.asarray(exit_idx),
        jnp.asarray(hop), jnp.asarray(log_b), jnp.asarray(mask),
    )
    assert grids.shape == (t, v, s)
    assert bool(jnp.isfinite(grids[0, :, 0]).all())
    # masked frames are identity steps
    np.testing.assert_array_equal(
        np.asarray(grids[-1]), np.asarray(grids[-7])
    )


def test_fused_factored_decode_lowers_and_matches_xla_backtrace():
    """The in-kernel backtrace (reverse-blocked grid + SMEM state carry)
    must lower AND match the XLA backtrace path bit-for-bit on hardware."""
    from lnasr_tpu.ops.factored_pallas import (
        factored_backtrace,
        factored_decode_pallas,
        factored_forward_pallas,
    )

    rng = _rng()
    v, s, t = 20, 3, 40
    pi = np.full((v, s), -1e30, np.float32)
    pi[:, 0] = np.log(1.0 / v)
    inner = np.full((v, s, s), -1e30, np.float32)
    for j in range(s):
        inner[:, j, j] = np.log(0.5)
        if j + 1 < s:
            inner[:, j, j + 1] = np.log(0.5)
    exit_idx = np.full(v, s - 1, np.int64)
    hop = rng.normal(size=(v, v)).astype(np.float32) - 2.0
    log_b = rng.normal(size=(t, v, s)).astype(np.float32)
    fin = np.where(rng.random((v, s)) < 0.5, 0.0, -np.inf).astype(np.float32)

    vg = factored_forward_pallas(
        jnp.asarray(pi), jnp.asarray(inner), jnp.asarray(exit_idx),
        jnp.asarray(hop), jnp.asarray(log_b),
    )
    ref_path, ref_score = factored_backtrace(
        vg, jnp.asarray(inner), jnp.asarray(exit_idx), jnp.asarray(hop),
        jnp.asarray(fin),
    )
    path, score = factored_decode_pallas(
        jnp.asarray(pi), jnp.asarray(inner), jnp.asarray(exit_idx),
        jnp.asarray(hop), jnp.asarray(log_b), jnp.asarray(fin),
    )
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref_path))
    assert float(score) == float(ref_score)


def test_lattice_kernel_lowers_and_matches_scan():
    """The lattice-recording kernel on hardware vs the lax.scan records."""
    from lnasr_tpu.models.decoder import factored_lattice_scan
    from lnasr_tpu.ops.factored_pallas import factored_lattice_pallas
    from lnasr_tpu.ops.trellis_pallas import NEG

    rng = _rng()
    v, s, t = 20, 3, 40
    pi = np.full((v, s), -1e30, np.float32)
    pi[:, 0] = np.log(1.0 / v)
    inner = np.full((v, s, s), -1e30, np.float32)
    for j in range(s):
        inner[:, j, j] = np.log(0.5)
        if j + 1 < s:
            inner[:, j, j + 1] = np.log(0.5)
    exit_idx = np.full(v, s - 1, np.int64)
    hop = rng.normal(size=(v, v)).astype(np.float32) - 2.0
    log_b = rng.normal(size=(t, v, s)).astype(np.float32)

    ref_s, ref_st, ref_p, _ = factored_lattice_scan(
        jnp.asarray(log_b), jnp.asarray(inner), jnp.asarray(hop),
        jnp.asarray(pi), jnp.asarray(exit_idx),
    )
    got_s, got_st, got_p = factored_lattice_pallas(
        jnp.asarray(pi), jnp.asarray(inner), jnp.asarray(exit_idx),
        jnp.asarray(hop), jnp.asarray(log_b),
    )
    np.testing.assert_array_equal(np.asarray(got_st), np.asarray(ref_st))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(
        np.maximum(np.asarray(ref_s), NEG), np.maximum(np.asarray(got_s), NEG)
    )


def test_fused_serving_programs_lower():
    """The serving path's ONE-dispatch programs — fused Pallas frontend +
    graph kernel under a single jit (Recognizer._fused_segment_fn /
    _fused_lattice_fn) — must compile and run on hardware; bench.py only
    exercises the pieces separately."""
    from lnasr_tpu.config import GMMHMMConfig, MFCCConfig
    from lnasr_tpu.models.lexicon import Lexicon
    from lnasr_tpu.models.recognizer import (
        AcousticModel,
        Recognizer,
        train_unit_models,
    )

    rng = _rng()
    sr = 16000

    def tone(f0, dur=0.4):
        t = np.arange(int(sr * dur)) / sr
        x = np.sin(2 * np.pi * f0 * t) * np.hanning(len(t)) * 9000
        return (x + rng.normal(0, 50, len(t))).astype(np.int16)

    mfcc_cfg = MFCCConfig(energy_floor=1e-10, mean_norm=False)
    am = AcousticModel(mfcc_config=mfcc_cfg)
    feats = lambda x: np.asarray(am.mfcc.features_fast(x)[0])  # noqa: E731
    examples = {
        "lo": [feats(tone(300)) for _ in range(3)],
        "hi": [feats(tone(1200)) for _ in range(3)],
    }
    cfg = GMMHMMConfig(n_states=3, n_mix=1, dim=39)
    am.units = train_unit_models(examples, cfg, iters=3)
    lex = Lexicon({"lo": ["lo"], "hi": ["hi"]})
    test_audio = tone(300)
    for graph in ("dense", "factored"):
        # fused one-dispatch program vs the two-step path ON DEVICE —
        # this asserts the lowering and cross-program consistency, not
        # the toy model's acoustics
        rec_b = Recognizer(am, lex, graph=graph, bucket_frames=64)
        rec_u = Recognizer(am, lex, graph=graph)
        words_b, score_b = rec_b.decode_segment(test_audio)
        words_u, score_u = rec_u.decode_segment(test_audio)
        assert words_b == words_u, (graph, words_b, words_u)
        assert np.isfinite(score_b) and np.isfinite(score_u)
    rec_f = Recognizer(am, lex, graph="factored", bucket_frames=64)
    hyps = rec_f.decode_segment_nbest(test_audio, n=2)
    best_words, _ = rec_f.decode_segment(test_audio)
    assert hyps and hyps[0].words == best_words


def test_rank1_kernels_lower_and_match_scan():
    """The round-5 rank-1 (word-loop) hop kernels on REAL hardware, at a
    vocabulary past the dense cap AND past the TC=16 tier (TC=8): fused
    decode and lattice recording must match the scan realization
    bitwise (the TC=4 tier failed exactly this lowering check)."""
    import types

    from lnasr_tpu.config import GMMHMMConfig
    from lnasr_tpu.models.decoder import (
        DecoderConfig,
        FactoredDecodingGraph,
        _factored_grid_inputs,
        factored_lattice_scan,
        factored_trellis_scan,
    )
    from lnasr_tpu.models.lexicon import Lexicon
    from lnasr_tpu.ops.factored_pallas import (
        factored_decode_pallas,
        factored_lattice_pallas,
        factored_rank1_ok,
    )

    rng = _rng()
    v, dim, ns, t = 3000, 6, 3, 50
    assert factored_rank1_ok(t, v)
    cfg = GMMHMMConfig(n_states=ns, n_mix=1, dim=dim)
    with np.errstate(divide="ignore"):
        log_a = np.log(np.where(np.eye(ns) + np.eye(ns, k=1) > 0,
                                0.5, 0.0)).astype(np.float32)
    means = rng.normal(scale=10.0, size=(v, dim))
    units = {
        f"w{i:04d}": types.SimpleNamespace(
            n=ns, config=cfg, log_a=log_a,
            log_w=np.zeros((ns, 1), np.float32),
            mu=(means[i][None, None, :]
                + np.arange(ns)[:, None, None] * 0.4).astype(np.float32),
            cov=np.full((ns, 1, dim), 0.3, np.float32),
        )
        for i in range(v)
    }
    graph = FactoredDecodingGraph.build(
        Lexicon.whole_word(sorted(units)), units, None,
        DecoderConfig(loop=True), dtype=jnp.float32, hop_mode="rank1",
    )
    assert graph.hop_rank1_only
    obs = rng.normal(scale=10.0, size=(t, dim)).astype(np.float32)
    log_b, pi_grid, final_grid = _factored_grid_inputs(
        jnp.asarray(obs), graph.log_pi_w, graph.log_final_w,
        graph.exit_idx, graph.state_map, graph.pad_mask,
        graph.log_w, graph.mu, graph.cov, graph.cov_type,
    )
    ps, ss = factored_trellis_scan(
        log_b, graph.inner_a, graph.hop, pi_grid, final_grid,
        graph.exit_idx, None,
    )
    pk, sk = factored_decode_pallas(
        pi_grid, graph.inner_a, graph.exit_idx, graph.hop, log_b,
        final_grid, None,
    )
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(pk))
    assert float(ss) == float(sk)

    s_sc, st_sc, pr_sc, _ = factored_lattice_scan(
        log_b, graph.inner_a, graph.hop, pi_grid, graph.exit_idx
    )
    s_k, st_k, pr_k = factored_lattice_pallas(
        pi_grid, graph.inner_a, graph.exit_idx, graph.hop, log_b
    )
    from lnasr_tpu.ops.trellis_pallas import NEG

    finite = np.asarray(s_sc) > NEG / 2
    np.testing.assert_array_equal(np.asarray(s_sc)[finite],
                                  np.asarray(s_k)[finite])
    np.testing.assert_array_equal(np.asarray(st_sc)[finite],
                                  np.asarray(st_k)[finite])
    np.testing.assert_array_equal(np.asarray(pr_sc)[finite],
                                  np.asarray(pr_k)[finite])
