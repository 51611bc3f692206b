"""Multi-device paths on the 8-device virtual CPU mesh: data-parallel EM
equals the single-chip result, sequence-parallel forward equals the scan."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lnasr_tpu.config import GMMHMMConfig, MeshConfig
from lnasr_tpu.models.gmmhmm import GMMHMM, gmmhmm_em_step
from lnasr_tpu.models.hmm import HMM, em_step
from lnasr_tpu.ops.trellis import forward_scan
from lnasr_tpu.parallel import (
    forward_seq_parallel,
    make_mesh,
    mesh_shape_for,
    train_data_parallel,
    viterbi_seq_parallel,
)

requires_multidevice = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def test_mesh_shape_inference():
    assert mesh_shape_for(8).shape == (8, 1, 1)
    assert mesh_shape_for(8, seq=2).shape == (4, 2, 1)
    assert mesh_shape_for(8, data=2, seq=2, model=2).shape == (2, 2, 2)
    with pytest.raises(ValueError):
        mesh_shape_for(8, seq=3)


@requires_multidevice
def test_dp_gmmhmm_matches_single_chip():
    rng = np.random.default_rng(0)
    cfg = GMMHMMConfig(n_states=3, n_mix=2, dim=4)
    obs = rng.normal(size=(8, 20, 4))
    mask = np.ones((8, 20), bool)

    single = GMMHMM(cfg, dtype=jnp.float64).reset("random", jax.random.PRNGKey(1))
    params0 = single.params
    p_single, ll_single = gmmhmm_em_step(
        params0, jnp.asarray(obs), jnp.asarray(mask), cov_type="diag"
    )

    mesh = make_mesh(mesh_shape_for(8))
    sharded = GMMHMM(cfg, dtype=jnp.float64).reset("random", jax.random.PRNGKey(1))
    hist = train_data_parallel(sharded, obs, mask, mesh, iters=1)

    np.testing.assert_allclose(hist[0], float(ll_single), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(sharded.mu), np.asarray(p_single.mu), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(sharded.log_a), np.asarray(p_single.log_a), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sharded.cov), np.asarray(p_single.cov), rtol=1e-8, atol=1e-10
    )


@requires_multidevice
def test_dp_hmm_matches_single_chip():
    rng = np.random.default_rng(2)
    obs = rng.integers(0, 5, size=(16, 30))
    mask = np.ones((16, 30), bool)

    single = HMM(3, 5, dtype=jnp.float64).reset("random", jax.random.PRNGKey(3))
    p_single, ll_single = em_step(single.params, jnp.asarray(obs), jnp.asarray(mask))

    mesh = make_mesh(mesh_shape_for(8))
    sharded = HMM(3, 5, dtype=jnp.float64).reset("random", jax.random.PRNGKey(3))
    hist = train_data_parallel(sharded, obs, mask, mesh, iters=1)

    np.testing.assert_allclose(hist[0], float(ll_single), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(sharded.log_a), np.asarray(p_single.log_a), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sharded.log_b), np.asarray(p_single.log_b), rtol=1e-8, atol=1e-10
    )


@requires_multidevice
def test_dp_multi_iteration_improves():
    rng = np.random.default_rng(4)
    cfg = GMMHMMConfig(n_states=2, n_mix=2, dim=3)
    obs = rng.normal(size=(8, 25, 3)) + rng.normal(size=(8, 1, 3))
    mask = np.ones((8, 25), bool)
    mesh = make_mesh(mesh_shape_for(8))
    model = GMMHMM(cfg, dtype=jnp.float64)
    model.init_from_data(obs.reshape(-1, 3), jax.random.PRNGKey(5))
    hist = train_data_parallel(model, obs, mask, mesh, iters=8)
    assert hist[-1] > hist[0]
    assert np.all(np.isfinite(hist))


@requires_multidevice
@pytest.mark.parametrize("seq", [2, 4, 8])
def test_seq_parallel_forward(seq):
    rng = np.random.default_rng(seq)
    n, t = 5, 64
    log_a = np.log(rng.dirichlet(np.ones(n), size=n))
    log_pi = np.log(rng.dirichlet(np.ones(n)))
    log_b = rng.normal(size=(t, n))

    ref = forward_scan(jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b))
    mesh = make_mesh(mesh_shape_for(8, data=8 // seq, seq=seq))
    alpha, loglik = forward_seq_parallel(
        jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b), mesh
    )
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(float(loglik), float(ref.loglik), rtol=1e-12)


@requires_multidevice
@pytest.mark.parametrize("seq", [2, 4])
def test_seq_parallel_viterbi(seq):
    from lnasr_tpu.ops.trellis import viterbi_scan

    rng = np.random.default_rng(seq + 10)
    n, t = 4, 48
    log_a = np.log(rng.dirichlet(np.ones(n), size=n))
    log_pi = np.log(rng.dirichlet(np.ones(n)))
    log_b = rng.normal(size=(t, n))

    ref = viterbi_scan(jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b))
    mesh = make_mesh(mesh_shape_for(8, data=8 // seq, seq=seq))
    path, score = viterbi_seq_parallel(
        jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b), mesh
    )
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))
    np.testing.assert_allclose(float(score), float(ref.score), rtol=1e-12)


@requires_multidevice
@pytest.mark.parametrize("seq,t", [(2, 64), (4, 37), (8, 64)])
def test_seq_parallel_backward(seq, t):
    """Backward over the seq axis equals the sequential scan, including
    non-divisible T (auto-padding) and masked tails."""
    from lnasr_tpu.ops.trellis import backward_scan
    from lnasr_tpu.parallel import backward_seq_parallel

    rng = np.random.default_rng(seq * 100 + t)
    n = 5
    log_a = np.log(rng.dirichlet(np.ones(n), size=n))
    log_b = rng.normal(size=(t, n))
    mask = np.ones(t, bool)
    mask[t - 4 :] = False

    mesh = make_mesh(mesh_shape_for(8, data=8 // seq, seq=seq))
    for mk in (None, mask):
        ref = backward_scan(
            jnp.asarray(log_a), jnp.asarray(log_b),
            None if mk is None else jnp.asarray(mk),
        )
        beta = backward_seq_parallel(
            jnp.asarray(log_a), jnp.asarray(log_b), mesh,
            None if mk is None else jnp.asarray(mk),
        )
        np.testing.assert_allclose(
            np.asarray(beta), np.asarray(ref), rtol=1e-9, atol=1e-11
        )


@requires_multidevice
def test_seq_parallel_forward_masked_nondivisible():
    from lnasr_tpu.parallel import forward_seq_parallel

    rng = np.random.default_rng(41)
    n, t = 4, 45  # not divisible by 4
    log_a = np.log(rng.dirichlet(np.ones(n), size=n))
    log_pi = np.log(rng.dirichlet(np.ones(n)))
    log_b = rng.normal(size=(t, n))
    mask = np.arange(t) < 39

    ref = forward_scan(
        jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b),
        jnp.asarray(mask),
    )
    mesh = make_mesh(mesh_shape_for(8, data=2, seq=4))
    alpha, loglik = forward_seq_parallel(
        jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b), mesh,
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(float(loglik), float(ref.loglik), rtol=1e-12)


@requires_multidevice
def test_seq_parallel_viterbi_masked_nondivisible():
    from lnasr_tpu.ops.trellis import viterbi_scan
    from lnasr_tpu.parallel import viterbi_seq_parallel

    rng = np.random.default_rng(42)
    n, t = 4, 30  # not divisible by 8
    log_a = np.log(rng.dirichlet(np.ones(n), size=n))
    log_pi = np.log(rng.dirichlet(np.ones(n)))
    log_b = rng.normal(size=(t, n))
    mask = np.arange(t) < 26

    ref = viterbi_scan(jnp.asarray(log_pi), jnp.asarray(log_a),
                       jnp.asarray(log_b), jnp.asarray(mask))
    mesh = make_mesh(mesh_shape_for(8, data=1, seq=8))
    path, score = viterbi_seq_parallel(
        jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b), mesh,
        jnp.asarray(mask),
    )
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))
    np.testing.assert_allclose(float(score), float(ref.score), rtol=1e-12)


@requires_multidevice
@pytest.mark.parametrize("seq,t", [(8, 64), (4, 53)])
def test_seq_parallel_em_matches_single_chip(seq, t):
    """Baum-Welch on ONE long (masked, non-divisible) utterance sharded
    over the seq axis must reproduce the single-chip EM sweep."""
    from lnasr_tpu.parallel import train_seq_parallel

    rng = np.random.default_rng(seq + t)
    cfg = GMMHMMConfig(n_states=3, n_mix=2, dim=4)
    obs = rng.normal(size=(t, 4)) + np.sin(np.arange(t))[:, None]
    mask = np.arange(t) < t - 3

    single = GMMHMM(cfg, dtype=jnp.float64)
    single.init_from_data(obs, jax.random.PRNGKey(1))
    p_single, ll_single = gmmhmm_em_step(
        single.params, jnp.asarray(obs)[None], jnp.asarray(mask)[None],
        cov_type="diag",
    )

    mesh = make_mesh(mesh_shape_for(8, data=8 // seq, seq=seq))
    sharded = GMMHMM(cfg, dtype=jnp.float64)
    sharded.init_from_data(obs, jax.random.PRNGKey(1))
    hist = train_seq_parallel(sharded, obs, mesh, iters=1, mask=mask)

    np.testing.assert_allclose(hist[0], float(ll_single), rtol=1e-10)
    for name in ("log_a", "log_pi", "log_w", "mu", "cov"):
        np.testing.assert_allclose(
            np.asarray(getattr(sharded, name)),
            np.asarray(getattr(p_single, name)),
            rtol=1e-8, atol=1e-10, err_msg=name,
        )


@requires_multidevice
def test_seq_parallel_discrete_hmm_em_matches_single_chip():
    """The discrete-HMM seq-parallel EM reproduces the single-chip sweep
    on one long masked symbol sequence."""
    from lnasr_tpu.models.hmm import HMM, em_step as hmm_em_step
    from lnasr_tpu.parallel import train_seq_parallel

    rng = np.random.default_rng(5)
    t = 61
    obs = rng.integers(0, 3, size=t)
    mask = np.arange(t) < t - 4

    single = HMM(n=2, m=3, dtype=jnp.float64)
    single.reset("random", jax.random.PRNGKey(3))
    p_single, ll_single = hmm_em_step(
        single.params, jnp.asarray(obs)[None], jnp.asarray(mask)[None]
    )

    mesh = make_mesh(mesh_shape_for(8, data=1, seq=8))
    sharded = HMM(n=2, m=3, dtype=jnp.float64)
    sharded.reset("random", jax.random.PRNGKey(3))
    hist = train_seq_parallel(sharded, obs, mesh, iters=1, mask=mask)

    np.testing.assert_allclose(hist[0], float(ll_single), rtol=1e-10)
    for name in ("log_a", "log_b", "log_pi"):
        np.testing.assert_allclose(
            np.asarray(getattr(sharded.params, name)),
            np.asarray(getattr(p_single, name)),
            rtol=1e-8, atol=1e-10, err_msg=name,
        )


@requires_multidevice
def test_seq_parallel_em_multi_iteration_improves():
    from lnasr_tpu.parallel import train_seq_parallel

    rng = np.random.default_rng(77)
    cfg = GMMHMMConfig(n_states=2, n_mix=2, dim=3)
    obs = rng.normal(size=(96, 3)) + np.sign(np.sin(np.arange(96)))[:, None]
    mesh = make_mesh(mesh_shape_for(8, data=1, seq=8))
    model = GMMHMM(cfg, dtype=jnp.float64)
    model.init_from_data(obs, jax.random.PRNGKey(2))
    hist = train_seq_parallel(model, obs, mesh, iters=6)
    assert hist[-1] > hist[0]
    assert np.all(np.isfinite(hist))


@requires_multidevice
@pytest.mark.parametrize("model_axis", [2, 8])
def test_model_parallel_emissions(model_axis):
    from lnasr_tpu.ops.gaussian import gmm_emissions_diag
    from lnasr_tpu.parallel import make_mp_emission_fn

    rng = np.random.default_rng(model_axis)
    n, m, d, t = 3, 16, 6, 40
    log_w = np.log(rng.dirichlet(np.ones(m), size=n))
    mu = rng.normal(size=(n, m, d))
    var = rng.uniform(0.5, 2.0, size=(n, m, d))
    obs = rng.normal(size=(t, d))

    ref, _ = gmm_emissions_diag(
        jnp.asarray(obs), jnp.asarray(log_w), jnp.asarray(mu), jnp.asarray(var)
    )
    mesh = make_mesh(mesh_shape_for(8, data=8 // model_axis, model=model_axis))
    fn = make_mp_emission_fn(mesh)
    out = fn(jnp.asarray(obs), jnp.asarray(log_w), jnp.asarray(mu), jnp.asarray(var))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-9, atol=1e-11)


def _pipeline_fixture(seed, t=64, n=4, m=3, d=6):
    rng = np.random.default_rng(seed)
    log_a = np.log(rng.dirichlet(np.ones(n), size=n))
    log_pi = np.log(rng.dirichlet(np.ones(n)))
    log_w = np.log(rng.dirichlet(np.ones(m), size=n))
    mu = rng.normal(size=(n, m, d))
    var = rng.uniform(0.5, 2.0, size=(n, m, d))
    feats = rng.normal(size=(t, d))
    return tuple(jnp.asarray(x) for x in (log_pi, log_a, log_w, mu, var, feats))


@requires_multidevice
@pytest.mark.parametrize("chunk", [8, 16, 64])
def test_pipeline_forward_matches_scan(chunk):
    from lnasr_tpu.ops.gaussian import gmm_emissions_diag
    from lnasr_tpu.parallel import make_stage_mesh, streaming_pipeline_scores

    log_pi, log_a, log_w, mu, var, feats = _pipeline_fixture(chunk)
    log_b, _ = gmm_emissions_diag(feats, log_w, mu, var)
    ref = forward_scan(log_pi, log_a, log_b)
    mesh = make_stage_mesh()
    got = streaming_pipeline_scores(
        log_pi, log_a, log_w, mu, var, feats, mesh, chunk=chunk
    )
    np.testing.assert_allclose(float(got), float(ref.loglik), rtol=1e-10)


@requires_multidevice
def test_pipeline_max_semiring_matches_viterbi():
    from lnasr_tpu.ops.gaussian import gmm_emissions_diag
    from lnasr_tpu.ops.trellis import viterbi_scan
    from lnasr_tpu.parallel import make_stage_mesh, streaming_pipeline_scores

    log_pi, log_a, log_w, mu, var, feats = _pipeline_fixture(99)
    log_b, _ = gmm_emissions_diag(feats, log_w, mu, var)
    ref = viterbi_scan(log_pi, log_a, log_b)
    mesh = make_stage_mesh()
    got = streaming_pipeline_scores(
        log_pi, log_a, log_w, mu, var, feats, mesh, chunk=16, semiring="max"
    )
    np.testing.assert_allclose(float(got), float(ref.score), rtol=1e-10)


@requires_multidevice
@pytest.mark.parametrize("n_stages", [3, 4, 8])
def test_pipeline_multistage_matches_scan(n_stages):
    """S-stage pipelines (S-1 mixture-sharded emission stages + decoder)
    must reproduce the sequential result exactly — including stage counts
    that don't divide the mixture count (padding path)."""
    from lnasr_tpu.ops.gaussian import gmm_emissions_diag
    from lnasr_tpu.parallel import make_stage_mesh, streaming_pipeline_scores

    log_pi, log_a, log_w, mu, var, feats = _pipeline_fixture(n_stages)
    log_b, _ = gmm_emissions_diag(feats, log_w, mu, var)
    ref = forward_scan(log_pi, log_a, log_b)
    mesh = make_stage_mesh(n_stages=n_stages)
    got = streaming_pipeline_scores(
        log_pi, log_a, log_w, mu, var, feats, mesh, chunk=16
    )
    np.testing.assert_allclose(float(got), float(ref.loglik), rtol=1e-10)


@requires_multidevice
@pytest.mark.parametrize("n_stages", [2, 4])
def test_pipeline_decode_matches_viterbi(n_stages):
    """The pipelined decode path must return the exact Viterbi path and
    score, not just the best-path score."""
    from lnasr_tpu.ops.gaussian import gmm_emissions_diag
    from lnasr_tpu.ops.trellis import viterbi_scan
    from lnasr_tpu.parallel import make_stage_mesh, streaming_pipeline_decode

    log_pi, log_a, log_w, mu, var, feats = _pipeline_fixture(50 + n_stages)
    log_b, _ = gmm_emissions_diag(feats, log_w, mu, var)
    ref = viterbi_scan(log_pi, log_a, log_b)
    mesh = make_stage_mesh(n_stages=n_stages)
    path, score = streaming_pipeline_decode(
        log_pi, log_a, log_w, mu, var, feats, mesh, chunk=16
    )
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))
    np.testing.assert_allclose(float(score), float(ref.score), rtol=1e-10)


@requires_multidevice
def test_pipeline_rejects_bad_args():
    from lnasr_tpu.parallel import make_stage_mesh, streaming_pipeline_scores

    log_pi, log_a, log_w, mu, var, feats = _pipeline_fixture(3)
    mesh = make_stage_mesh()
    with pytest.raises(ValueError, match="chunk"):
        streaming_pipeline_scores(log_pi, log_a, log_w, mu, var, feats, mesh, chunk=7)
    with pytest.raises(ValueError, match="semiring"):
        streaming_pipeline_scores(
            log_pi, log_a, log_w, mu, var, feats, mesh, chunk=16, semiring="sum"
        )


@requires_multidevice
def test_mesh_degrades_to_single_device():
    """The same sharded code must run on a 1-device mesh."""
    rng = np.random.default_rng(7)
    cfg = GMMHMMConfig(n_states=2, n_mix=1, dim=3)
    obs = rng.normal(size=(4, 10, 3))
    mask = np.ones((4, 10), bool)
    mesh = make_mesh(MeshConfig(1, 1, 1), devices=jax.devices()[:1])
    model = GMMHMM(cfg, dtype=jnp.float64).reset("random", jax.random.PRNGKey(8))
    hist = train_data_parallel(model, obs, mask, mesh, iters=2)
    assert np.all(np.isfinite(hist))


# -- model-parallel TRAINING (round-3: the TP EM step) ------------------------


@requires_multidevice
@pytest.mark.parametrize("mesh_axes", [(1, 4), (2, 4)])
def test_mp_gmmhmm_em_matches_single_chip(mesh_axes):
    """Mixture-sharded Baum-Welch: mean/cov/weight updates computed per
    shard for its own components (no M gather) must match the single-chip
    step to float-reassociation tolerance, for one step and for three."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from lnasr_tpu.parallel import make_mp_gmmhmm_em_step, mp_param_specs

    d_ax, m_ax = mesh_axes
    rng = np.random.default_rng(5)
    cfg = GMMHMMConfig(n_states=3, n_mix=4, dim=5)
    obs = rng.normal(size=(4, 18, 5))
    mask = np.ones((4, 18), bool)
    mask[2, 14:] = False

    single = GMMHMM(cfg, dtype=jnp.float64).reset("random", jax.random.PRNGKey(2))
    p_ref = single.params
    devices = np.array(jax.devices()[: d_ax * m_ax]).reshape(d_ax, m_ax)
    mesh = Mesh(devices, ("data", "model"))
    step = make_mp_gmmhmm_em_step(mesh, cfg)
    pspecs = mp_param_specs(cfg.cov_type)
    p_mp = type(p_ref)(*(
        jax.device_put(x, NamedSharding(mesh, s))
        for x, s in zip(p_ref, pspecs)
    ))
    obs_j = jax.device_put(jnp.asarray(obs), NamedSharding(mesh, P("data")))
    mask_j = jax.device_put(jnp.asarray(mask), NamedSharding(mesh, P("data")))

    for it in range(3):
        p_ref, ll_ref = gmmhmm_em_step(p_ref, jnp.asarray(obs),
                                       jnp.asarray(mask), cov_type="diag")
        p_mp, ll_mp = step(p_mp, obs_j, mask_j)
        np.testing.assert_allclose(float(ll_mp), float(ll_ref), rtol=1e-12)
        for name in p_ref._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(p_mp, name)),
                np.asarray(getattr(p_ref, name)),
                rtol=1e-9, atol=1e-11, err_msg=f"{name} @ iter {it}",
            )


@requires_multidevice
def test_train_model_parallel_loop_and_resume(tmp_path):
    """The MP trainer drives the same step through the shared EM loop
    (loglik improves) and honors checkpoint/resume."""
    from jax.sharding import Mesh
    from lnasr_tpu.config import TrainConfig
    from lnasr_tpu.parallel import train_model_parallel

    rng = np.random.default_rng(6)
    cfg = GMMHMMConfig(n_states=2, n_mix=4, dim=3)
    obs = rng.normal(size=(4, 12, 3))
    mask = np.ones((4, 12), bool)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model"))

    def fresh():
        m = GMMHMM(cfg, dtype=jnp.float64)
        m.init_from_data(obs.reshape(-1, 3), jax.random.PRNGKey(3))
        return m

    ref = fresh()
    hist = train_model_parallel(ref, obs, mask, mesh,
                                config=TrainConfig(max_iters=4, eps=0.0))
    assert len(hist) == 4 and hist[-1] >= hist[0]

    ck = str(tmp_path / "mp")
    killed = fresh()
    train_model_parallel(killed, obs, mask, mesh,
                         config=TrainConfig(max_iters=2, eps=0.0,
                                            checkpoint_every=1,
                                            checkpoint_dir=ck))
    resumed = fresh()
    train_model_parallel(resumed, obs, mask, mesh,
                         config=TrainConfig(max_iters=4, eps=0.0,
                                            checkpoint_every=1,
                                            checkpoint_dir=ck))
    for a, b in zip(resumed.params, ref.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


def test_dp_sharded_decode_matches_local_batch():
    """decode_batch_sharded over the ('data',) mesh must reproduce the
    local decode_batch exactly (graph replicated, batch sharded)."""
    import types

    from lnasr_tpu.config import GMMHMMConfig
    from lnasr_tpu.models.decoder import DecoderConfig, FactoredDecodingGraph
    from lnasr_tpu.models.lexicon import Lexicon
    from lnasr_tpu.parallel import decode_batch_sharded, make_mesh, mesh_shape_for

    rng = np.random.default_rng(5)
    v, dim, n_states = 12, 5, 3
    cfg = GMMHMMConfig(n_states=n_states, n_mix=1, dim=dim)
    means = rng.normal(scale=8.0, size=(v, dim))
    with np.errstate(divide="ignore"):
        log_a = np.log(
            np.where(np.eye(n_states) + np.eye(n_states, k=1) > 0, 0.5, 0.0)
        ).astype(np.float32)
    units = {
        f"w{i:02d}": types.SimpleNamespace(
            n=n_states, config=cfg, log_a=log_a,
            log_w=np.zeros((n_states, 1), np.float32),
            mu=(means[i][None, None, :]
                + rng.normal(scale=0.3, size=(n_states, 1, dim))
                ).astype(np.float32),
            cov=np.full((n_states, 1, dim), 0.1, np.float32),
        )
        for i in range(v)
    }
    graph = FactoredDecodingGraph.build(
        Lexicon.whole_word(sorted(units)), units, None,
        DecoderConfig(loop=True), dtype=jnp.float32,
    )
    b, t = 8, 21
    feats = rng.normal(scale=8.0, size=(b, t, dim)).astype(np.float32)
    masks = np.ones((b, t), bool)
    masks[1, 15:] = False  # one bucket-padded segment

    mesh = make_mesh(mesh_shape_for(8, data=8))
    got = decode_batch_sharded(graph, feats, masks, mesh)
    ref = graph.decode_batch(feats, masks)
    for (gw, gp, gs), (rw, rp, rs) in zip(got, ref):
        assert gw == rw
        np.testing.assert_array_equal(gp, rp)
        assert gs == rs


def test_dp_sharded_decode_rejects_indivisible_batch():
    import types

    from lnasr_tpu.config import GMMHMMConfig
    from lnasr_tpu.models.decoder import DecoderConfig, FactoredDecodingGraph
    from lnasr_tpu.models.lexicon import Lexicon
    from lnasr_tpu.parallel import decode_batch_sharded, make_mesh, mesh_shape_for

    rng = np.random.default_rng(0)
    cfg = GMMHMMConfig(n_states=2, n_mix=1, dim=3)
    with np.errstate(divide="ignore"):
        log_a = np.log(np.eye(2) * 0.5 + np.eye(2, k=1) * 0.5).astype(np.float32)
    units = {"w0": types.SimpleNamespace(
        n=2, config=cfg, log_a=log_a,
        log_w=np.zeros((2, 1), np.float32),
        mu=rng.normal(size=(2, 1, 3)).astype(np.float32),
        cov=np.ones((2, 1, 3), np.float32))}
    graph = FactoredDecodingGraph.build(
        Lexicon.whole_word(["w0"]), units, None, DecoderConfig(loop=True),
        dtype=jnp.float32,
    )
    mesh = make_mesh(mesh_shape_for(8, data=8))
    with pytest.raises(ValueError, match="divide"):
        decode_batch_sharded(
            graph, np.zeros((3, 5, 3), np.float32), np.ones((3, 5), bool),
            mesh,
        )
