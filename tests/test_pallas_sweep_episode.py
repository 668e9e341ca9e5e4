"""Scenario-batched sweep megakernel (ops/pallas_sweep_episode.py) tests.

The sweep kernel advances S independent pendulum DuSt episodes inside
one Pallas program (scenario-stacked tile rows, block-masked MXU
pairwise matrices). Ground truth is S independent runs of the
independently-tested single-episode megakernel
(tests/test_pallas_episode.py) fed the matching per-scenario noise
slices — TPU interpret mode zero-stubs the hardware PRNG, so CPU tests
drive host-noise mode, exactly like the single-episode tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dust_tpu.ops.pallas_episode import fused_pendulum_episode
from dust_tpu.ops.pallas_sweep_episode import fused_pendulum_sweep_episode

HZ, M, NP, NA, MM = 30, 3, 8, 128, 50
SIG, LR, ALPHA, TEMP, PSIG = 2.0, 2.0, 1.0, 1.0, 2.0
MLR, MSIG, PBW0 = 1e-3, 0.1, 0.05


def _setup(n_sc, steps, seed=0):
    key = jax.random.key(seed)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    theta0 = jax.random.normal(k1, (M, HZ)) * 0.3
    mpfx0 = jnp.stack(
        [1.0 + 0.1 * jax.random.normal(k2, (MM,)),
         1.0 + 0.1 * jax.random.normal(k3, (MM,))], axis=1
    )
    smp = -(-n_sc * M // 8) * 8
    eps = jax.random.normal(k4, (steps, HZ, smp, 128))
    pdz = jax.random.normal(k5, (steps, n_sc, 8, 128))
    pdu = jax.random.uniform(k6, (steps, n_sc, 8, 128))
    lens = jnp.linspace(0.8, 1.2, n_sc)
    mass = jnp.linspace(0.9, 1.1, n_sc)
    return theta0, mpfx0, eps, pdz, pdu, lens, mass


def _run_sweep(n_sc, steps, theta0, mpfx0, eps, pdz, pdu, lens, mass,
               warm_up=0, unroll=False, interpret=True, **kw):
    return fused_pendulum_sweep_episode(
        jnp.zeros(2, jnp.int32), jnp.array([np.pi, 0.0]), theta0, theta0,
        jnp.zeros((M, HZ)), mpfx0, PBW0, lens, mass,
        SIG, LR, ALPHA, TEMP, PSIG, MLR, MSIG,
        n_sc=n_sc, steps=steps, warm_up=warm_up, hz=HZ, m=M, n_params=NP,
        n_act=NA, m_mpf=MM, mpf_steps=20, unroll=unroll,
        host_eps=eps, host_pdz=pdz, host_pdu=pdu, interpret=interpret,
        **kw,
    )


def _run_single(steps, theta0, mpfx0, eps_s, pdz_s, pdu_s, ln, ms,
                warm_up=0, unroll=False, interpret=True):
    return fused_pendulum_episode(
        jnp.zeros(2, jnp.int32), jnp.array([np.pi, 0.0]), theta0, theta0,
        jnp.zeros((M, HZ)), jnp.zeros(HZ), mpfx0, PBW0, ln, ms,
        SIG, LR, ALPHA, TEMP, PSIG, MLR, MSIG,
        steps=steps, warm_up=warm_up, hz=HZ, m=M, n_params=NP, n_act=NA,
        m_mpf=MM, mpf_steps=20, unroll=unroll,
        host_eps=eps_s, host_pdz=pdz_s, host_pdu=pdu_s,
        interpret=interpret,
    )


# interpret-mode (CPU, exact f32 everywhere) tolerances are
# reassociation-level: the sweep kernel computes pairwise distances via
# centered MXU Gram matrices where the single-episode kernel uses
# explicit per-column differences
_CPU_TOLS = dict(cost=1e-3, th=1e-4, om=1e-3, action=1e-3, bw_sv=1e-5,
                 bw_mpf=1e-5, theta=1e-3, a_mat=1e-3, mpf_x=1e-4)
# hardware tolerances are ~3x the deltas MEASURED between the two
# separately Mosaic-compiled kernels at steps=1 (2026-08-20, v5e,
# 8 scenarios): the MXU's split-bf16 f32 dot_generals contract in a
# different order per kernel, the SVGD/MPF update loops amplify that
# by lr and iteration count (measured: om 6.7e-3, cost 3.7e-4 at
# magnitude 2e2, th 3.4e-4, action 3.1e-2, theta 1.2e-1, mpf_x 7.8e-3;
# bw_sv/bw_mpf/a_mat bit-exact). A real layout or scenario-mapping bug
# is 10-100x past these bounds (wrong-lane theta is O(1)).
_HW_TOLS = dict(cost=5e-3, th=2e-3, om=2e-2, action=1e-1, bw_sv=1e-5,
                bw_mpf=1e-5, theta=5e-1, a_mat=1e-4, mpf_x=3e-2)


def _assert_sweep_matches_singles(n_sc, steps, *, unroll, interpret,
                                  tols=_CPU_TOLS):
    """Sweep kernel vs n_sc independent single-episode runs on matched
    host noise."""
    theta0, mpfx0, eps, pdz, pdu, lens, mass = _setup(n_sc, steps)
    out = _run_sweep(n_sc, steps, theta0, mpfx0, eps, pdz, pdu, lens,
                     mass, unroll=unroll, interpret=interpret)
    for s in range(n_sc):
        eps_s = jnp.zeros((steps, HZ, 8, 128)).at[:, :, :M, :].set(
            eps[:, :, s * M:(s + 1) * M, :]
        )
        ref = _run_single(steps, theta0, mpfx0, eps_s, pdz[:, s],
                          pdu[:, s], lens[s], mass[s], unroll=unroll,
                          interpret=interpret)
        for k in ("cost", "th", "om", "action", "bw_sv", "bw_mpf"):
            np.testing.assert_allclose(
                np.asarray(out[k][:, s]), np.asarray(ref[k]),
                atol=tols[k], err_msg=f"{k} scenario {s}",
            )
        for k in ("theta", "a_mat", "mpf_x"):
            np.testing.assert_allclose(out[k][s], ref[k],
                                       atol=tols[k],
                                       err_msg=f"{k} {s}")


@pytest.mark.parametrize("n_sc", [2, 3, 5, 8, 16])
def test_sweep_matches_independent_single_episodes(n_sc):
    """Every scenario of the sweep kernel must reproduce an independent
    single-episode run on the same noise. n_sc=2 exercises the
    sublane-padding path (S*m=6 rows padded to 8); n_sc=8 is the r1-r3
    production group size; odd n_sc (3, 5) exercises the MPF pairing's
    missing-B-half path (the last pair block has junk lanes 64:128 that
    must stay masked out of scenario results); n_sc=16 exercises the r4
    WIDENED scenario tiles (ns=16 sim/log rows, 8 MPF pair blocks,
    stride-16 log packing — the latency-bound group-step makes S=16 the
    throughput layout, BASELINE.md r4). TPU interpret mode zero-stubs
    the hardware PRNG and Mosaic rejects the rolled body, so this CPU
    suite drives the ROLLED body; the hardware test below covers the
    production unrolled path."""
    _assert_sweep_matches_singles(n_sc, 2, unroll=False, interpret=True)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="validates the production Mosaic (unrolled) "
                           "path on real hardware")
def test_sweep_hardware_parity_host_noise():
    """VERDICT r2 #4: the exact code path that produces the headline —
    the UNROLLED sweep megakernel compiled by Mosaic on hardware — is
    numerically pinned to the independently-tested single-episode kernel
    at matched host noise (the CPU suite can only exercise the rolled
    body, which Mosaic rejects on TPU). ONE step at the measured
    hardware tolerances (_HW_TOLS): feeding step 1's state into step 2
    compounds the two kernels' split-bf16/FMA contraction differences
    chaotically, so a single full solve + state-commit round trip is
    the statement this test makes; the every-step closed-loop agreement
    lives in the CPU suite where both kernels share exact f32."""
    _assert_sweep_matches_singles(8, 1, unroll=True, interpret=False,
                                  tols=_HW_TOLS)


@pytest.mark.parametrize("n_sc", [3, 8])
@pytest.mark.parametrize("layout", ["lanepack", "symm"])
def test_sweep_drive_layouts_agree(n_sc, layout):
    """The r3 drive layouts (lane-packed matmul; symmetric lane
    contraction with a column-space carry) and the colbcast+brs layout
    compute the same MPF updates (tolerances are reassociation-level:
    MXU contractions vs per-block row sums)."""
    steps = 2
    theta0, mpfx0, eps, pdz, pdu, lens, mass = _setup(n_sc, steps,
                                                      seed=13)
    out_a = _run_sweep(n_sc, steps, theta0, mpfx0, eps, pdz, pdu, lens,
                       mass, mpf_drive_layout=layout)
    out_b = _run_sweep(n_sc, steps, theta0, mpfx0, eps, pdz, pdu, lens,
                       mass, mpf_drive_layout="colbcast")
    for k, tol in (("cost", 1e-3), ("th", 1e-4), ("om", 1e-3),
                   ("action", 1e-3), ("bw_mpf", 1e-5)):
        np.testing.assert_allclose(np.asarray(out_a[k]),
                                   np.asarray(out_b[k]), atol=tol,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(out_a["mpf_x"]),
                               np.asarray(out_b["mpf_x"]), atol=1e-5)


def test_sweep_scenario_isolation():
    """Changing one scenario's true parameters must not perturb any
    other scenario (the block masks keep scenarios independent)."""
    n_sc, steps = 4, 2
    theta0, mpfx0, eps, pdz, pdu, lens, mass = _setup(n_sc, steps,
                                                      seed=3)
    out_a = _run_sweep(n_sc, steps, theta0, mpfx0, eps, pdz, pdu, lens,
                       mass)
    lens_b = lens.at[2].set(1.4)
    mass_b = mass.at[2].set(0.7)
    out_b = _run_sweep(n_sc, steps, theta0, mpfx0, eps, pdz, pdu,
                       lens_b, mass_b)
    others = np.array([0, 1, 3])
    for k in ("cost", "th", "om", "action", "bw_sv", "bw_mpf"):
        np.testing.assert_array_equal(
            np.asarray(out_a[k][:, others]),
            np.asarray(out_b[k][:, others]), err_msg=k,
        )
    # scenario 2 itself must react to its changed dynamics (exact
    # inequality: at 2 steps the divergence is small but nonzero)
    for k in ("cost", "th", "om"):
        assert (np.asarray(out_a[k][:, 2])
                != np.asarray(out_b[k][:, 2])).any(), k
    np.testing.assert_array_equal(np.asarray(out_a["theta"][others]),
                                  np.asarray(out_b["theta"][others]))
    np.testing.assert_array_equal(np.asarray(out_a["mpf_x"][others]),
                                  np.asarray(out_b["mpf_x"][others]))


def test_sweep_warmup_gates_forward():
    """During warm-up no action is applied (the simulator sees zero
    torque) and the policy prior stays put, mirroring the
    single-episode kernel's warm-up semantics."""
    n_sc, steps = 2, 2
    theta0, mpfx0, eps, pdz, pdu, lens, mass = _setup(n_sc, steps,
                                                      seed=5)
    out = _run_sweep(n_sc, steps, theta0, mpfx0, eps, pdz, pdu, lens,
                     mass, warm_up=steps)
    np.testing.assert_array_equal(np.asarray(out["action"]), 0.0)
    for s in range(n_sc):
        eps_s = jnp.zeros((steps, HZ, 8, 128)).at[:, :, :M, :].set(
            eps[:, :, s * M:(s + 1) * M, :]
        )
        ref = _run_single(steps, theta0, mpfx0, eps_s, pdz[:, s],
                          pdu[:, s], lens[s], mass[s], warm_up=steps)
        np.testing.assert_allclose(out["theta"][s], ref["theta"],
                                   atol=1e-3)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel hardware PRNG requires a real TPU")
def test_sweep_device_rng_deterministic():
    n_sc, steps = 8, 4
    theta0, mpfx0, _, _, _, lens, mass = _setup(n_sc, steps)

    def run():
        return fused_pendulum_sweep_episode(
            jnp.array([3, 7], jnp.int32), jnp.array([np.pi, 0.0]),
            theta0, theta0, jnp.zeros((M, HZ)), mpfx0, PBW0, lens, mass,
            SIG, LR, ALPHA, TEMP, PSIG, MLR, MSIG,
            n_sc=n_sc, steps=steps, hz=HZ, m=M, n_params=NP, n_act=NA,
            m_mpf=MM, mpf_steps=20,
        )

    a, b = run(), run()
    np.testing.assert_array_equal(np.asarray(a["cost"]),
                                  np.asarray(b["cost"]))
    assert np.isfinite(np.asarray(a["cost"])).all()


def test_sweep_svmpc_only_mode():
    """svmpc_only degenerates the dual loop to the SV-MPC case: one MPF
    particle at the default params, zero prior bandwidth, zero MPF
    steps. Pinned property: the dynamics-draw noise (pdz/pdu) has NO
    effect (every draw is exactly the default parameters), while the
    action noise still drives the episodes."""
    from dust_tpu.experiments import build_pendulum_stack, load_config
    from dust_tpu.simulation import megakernel_pendulum_sweep_fn

    cfg = load_config("demo/pendulum_config.yaml")
    exp = cfg["exp_params"]
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="svmpc")
    n_sc, steps = 2, 2
    hz, m = exp["horizon"], exp["n_particles"]
    smp = -(-n_sc * m // 8) * 8
    sweep = megakernel_pendulum_sweep_fn(
        stack, exp, steps=steps, n_sc=n_sc, unroll=False,
        interpret=True, svmpc_only=True,
    )
    lens = jnp.ones(n_sc)
    mass = jnp.ones(n_sc)
    key = jax.random.key(4)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    eps = jax.random.normal(k1, (steps, hz, smp, 128))
    pdz_a = jax.random.normal(k2, (steps, n_sc, 8, 128))
    pdu_a = jax.random.uniform(k3, (steps, n_sc, 8, 128))
    pdz_b = jax.random.normal(k4, (steps, n_sc, 8, 128))
    pdu_b = jax.random.uniform(k5, (steps, n_sc, 8, 128))
    seed = jnp.zeros(2, jnp.int32)
    out_a = sweep(seed, lens, mass, host_eps=eps, host_pdz=pdz_a,
                  host_pdu=pdu_a)
    out_b = sweep(seed, lens, mass, host_eps=eps, host_pdz=pdz_b,
                  host_pdu=pdu_b)
    for k in ("cost", "th", "om", "action", "theta"):
        np.testing.assert_array_equal(np.asarray(out_a[k]),
                                      np.asarray(out_b[k]), err_msg=k)
    # MPF posterior is frozen at the default params
    np.testing.assert_array_equal(
        np.asarray(out_a["mpf_x"]),
        np.broadcast_to(np.array([[1.0, 1.0]], np.float32),
                        (n_sc, 1, 2)),
    )
    # actions are live (nonzero swing-up torque from step 0)
    assert np.abs(np.asarray(out_a["action"])).max() > 0.0


def test_sweep_nan_scenario_isolation():
    """A diverged scenario must stay NaN in its own lanes WITHOUT
    poisoning healthy scenarios: the cross-row matmuls sanitize their
    column operands (0 * NaN = NaN would otherwise leak through the
    block masks). Inject NaN via one scenario's true parameters."""
    n_sc, steps = 4, 2
    theta0, mpfx0, eps, pdz, pdu, lens, mass = _setup(n_sc, steps,
                                                      seed=9)
    out_a = _run_sweep(n_sc, steps, theta0, mpfx0, eps, pdz, pdu, lens,
                       mass)
    lens_b = lens.at[1].set(jnp.nan)
    out_b = _run_sweep(n_sc, steps, theta0, mpfx0, eps, pdz, pdu,
                       lens_b, mass)
    others = np.array([0, 2, 3])
    for k in ("cost", "th", "om", "action", "bw_sv"):
        np.testing.assert_array_equal(
            np.asarray(out_a[k][:, others]),
            np.asarray(out_b[k][:, others]), err_msg=k,
        )
    np.testing.assert_array_equal(np.asarray(out_a["theta"][others]),
                                  np.asarray(out_b["theta"][others]))
    # the poisoned scenario itself reports NaN (not silently "healthy")
    assert not np.isfinite(np.asarray(out_b["th"][:, 1])).all()


@pytest.mark.parametrize("layout", ["colbcast", "lanepack", "symm"])
def test_sweep_mpf_nan_partner_isolation(layout):
    """NaN injected directly into one scenario's MPF *particles* must not
    leak into its lane-half partner (scenarios 2p / 2p+1 share each MPF
    tile's lanes 0:64 / 64:128): every drive layout sanitizes its matmul
    operands and lets the carry's own NaNs re-poison only the diverged
    half, keeping the partner's half bitwise intact. This is the
    sharpest isolation case — the partner shares every matmul of the
    MPF body, not just the block masks the finite-divergence test
    exercises."""
    n_sc, steps = 4, 2
    theta0, mpfx0, eps, pdz, pdu, lens, mass = _setup(n_sc, steps,
                                                      seed=11)
    mpfx_per = jnp.broadcast_to(mpfx0, (n_sc, MM, 2))
    out_a = _run_sweep(n_sc, steps, theta0, mpfx_per, eps, pdz, pdu,
                       lens, mass, mpf_drive_layout=layout)
    # poison scenario 1's MPF particles (partner of scenario 0 in pair
    # block 0; scenarios 2 and 3 live in pair block 1)
    mpfx_nan = mpfx_per.at[1].set(jnp.nan)
    out_b = _run_sweep(n_sc, steps, theta0, mpfx_nan, eps, pdz, pdu,
                       lens, mass, mpf_drive_layout=layout)
    others = np.array([0, 2, 3])
    for k in ("cost", "th", "om", "action", "bw_sv"):
        np.testing.assert_array_equal(
            np.asarray(out_a[k][:, others]),
            np.asarray(out_b[k][:, others]), err_msg=k,
        )
    np.testing.assert_array_equal(np.asarray(out_a["theta"][others]),
                                  np.asarray(out_b["theta"][others]))
    np.testing.assert_array_equal(np.asarray(out_a["mpf_x"][others]),
                                  np.asarray(out_b["mpf_x"][others]))
    # the poisoned scenario stays NaN (not silently repaired)
    assert not np.isfinite(np.asarray(out_b["mpf_x"][1])).all()


def test_sweep_layout_guards_raise():
    """The wrapper rejects configurations the tile layouts cannot
    represent instead of silently corrupting results."""
    n_sc, steps = 2, 1
    theta0, mpfx0, eps, pdz, pdu, lens, mass = _setup(n_sc, steps)

    def run(**over):
        kw = dict(n_sc=n_sc, steps=steps, hz=HZ, m=M, n_params=NP,
                  n_act=NA, m_mpf=MM, mpf_steps=20, unroll=False,
                  host_eps=eps, host_pdz=pdz, host_pdu=pdu,
                  interpret=True)
        kw.update(over)
        return fused_pendulum_sweep_episode(
            jnp.zeros(2, jnp.int32), jnp.array([np.pi, 0.0]), theta0,
            theta0, jnp.zeros((M, HZ)), mpfx0, PBW0, lens, mass,
            SIG, LR, ALPHA, TEMP, PSIG, MLR, MSIG, **kw,
        )

    with pytest.raises(ValueError, match="n_params"):
        run(n_params=9)
    with pytest.raises(ValueError, match="m\\*hz"):
        run(m=5)          # 5 * 30 = 150 > 128 lanes
    with pytest.raises(ValueError, match="m_mpf"):
        run(m_mpf=80)     # two scenarios cannot share 128 lanes
    with pytest.raises(ValueError, match="n_sc"):
        run(n_sc=17)      # 16 is the r4 widened-layout ceiling


def test_sweep_adapter_semantic_guards_raise():
    """The adapter rejects stack semantics the kernel does not model
    (weighted policy prior, nonzero controller plan, non-uniform prior
    mixture weights) instead of silently diverging."""
    from dust_tpu.experiments import build_pendulum_stack, load_config
    from dust_tpu.simulation import megakernel_pendulum_sweep_fn

    cfg = load_config("demo/pendulum_config.yaml")
    cfg["exp_params"]["weighted_prior"] = True
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="svmpc")
    with pytest.raises(ValueError, match="unweighted"):
        megakernel_pendulum_sweep_fn(
            stack, cfg["exp_params"], steps=1, n_sc=2, interpret=True
        )

    cfg2 = load_config("demo/pendulum_config.yaml")
    stack2 = build_pendulum_stack(cfg2, jax.random.key(0), case="svmpc")
    stack2.policies_prior = stack2.policies_prior.replace(
        logits=jnp.log(jnp.arange(1.0, 1.0 + cfg2["exp_params"]
                                  ["n_particles"]))
    )
    with pytest.raises(ValueError, match="uniform"):
        megakernel_pendulum_sweep_fn(
            stack2, cfg2["exp_params"], steps=1, n_sc=2, interpret=True
        )


def test_sweep_multi_chain_matches_single_chain_runs():
    """n_chains=2 (r4): two independent episode-chains advance inside
    ONE Pallas program (their step bodies run back-to-back per fori
    iteration so the scheduler can overlap serial dependency chains —
    measured +5.7-6.7% solves/s at the S=16/CH=4 bench default,
    BASELINE "r5 multi-chain verdict"). Each chain must be
    BIT-IDENTICAL to a single-chain run on the same per-chain host
    noise."""
    import numpy as np

    from dust_tpu.experiments import build_pendulum_stack, load_config
    from dust_tpu.simulation import megakernel_pendulum_sweep_fn

    cfg = load_config("/root/repo/demo/pendulum_config.yaml")
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="dust")
    exp = cfg["exp_params"]
    hz, m, n_sc, steps = exp["horizon"], exp["n_particles"], 8, 2
    smp = -(-n_sc * m // 8) * 8
    rng = np.random.default_rng(3)
    NCH = 2
    eps = rng.standard_normal((NCH, steps, hz, smp, 128)).astype(
        np.float32)
    pdz = rng.standard_normal((NCH, steps, n_sc, 8, 128)).astype(
        np.float32)
    pdu = rng.uniform(size=(NCH, steps, n_sc, 8, 128)).astype(
        np.float32)
    lens = jnp.linspace(0.8, 1.2, n_sc)
    mass = jnp.linspace(0.9, 1.1, n_sc)

    dual = megakernel_pendulum_sweep_fn(
        stack, exp, steps=steps, n_sc=n_sc, unroll=False,
        interpret=True, n_chains=NCH,
    )(jnp.array([1, 2], jnp.int32), lens, mass,
      host_eps=eps, host_pdz=pdz, host_pdu=pdu)
    single_fn = megakernel_pendulum_sweep_fn(
        stack, exp, steps=steps, n_sc=n_sc, unroll=False,
        interpret=True,
    )
    for c in range(NCH):
        single = single_fn(jnp.array([1, 2], jnp.int32), lens, mass,
                           host_eps=eps[c], host_pdz=pdz[c],
                           host_pdu=pdu[c])
        for k in ("cost", "th", "om", "action", "bw_sv", "bw_mpf",
                  "theta", "locs", "a_mat", "mpf_x"):
            np.testing.assert_array_equal(
                np.asarray(dual[k][c]), np.asarray(single[k]),
                err_msg=f"chain {c} field {k}")
