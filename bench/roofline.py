"""Roofline / MFU accounting for the hot kernels (VERDICT r1 #2).

Counts FLOPs and HBM bytes per invocation ANALYTICALLY from the kernel
structure (per-section formulas below mirror the code in
`ops/pallas_sweep_episode.py`, `ops/pallas_episode.py`,
`ops/pallas_mpf.py`), measures the achieved rate on the attached chip,
and reports achieved TFLOP/s, GB/s and the fraction of nominal v5e
peaks, naming the binding resource per kernel.

Nominal TPU v5e (1 chip) peaks used (public spec sheet numbers):
  MXU bf16        197 TFLOP/s   (4 MXUs; f32 dot_generals run as
                                 multi-pass bf16, ~1/4 effective)
  VPU f32         ~11.5 TFLOP/s (8x128 lanes x 4 ALUs x 2 FLOP FMA at
                                 ~1.4 GHz — the elementwise ceiling)
  HBM             819 GB/s

The DuSt kernels keep ALL state resident in VMEM across the whole
episode (inputs load once, logs store once), so HBM traffic per solve
is ~zero and the roofline x-axis (arithmetic intensity) is effectively
infinite: these kernels are NEVER HBM-bound. The binding resources are
(a) the VPU for the wide elementwise rollout/MPF tiles and (b) serial
dependency chains (hz- and mpf_steps-long fori loops of small-tile ops
that cannot fill the VPU pipeline) plus cross-unit data movement
(transposes, lane broadcasts, MXU<->VPU handoffs) — which is why
achieved-vs-VPU-peak is reported as the MFU figure of merit.

Run on the real TPU: `timeout 1200 python bench/roofline.py`
(env SKIP_MEASURE=1 prints the analytic table with recorded r2 rates).
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

# ---------------------------------------------------------------- peaks
MXU_BF16 = 197e12
MXU_F32 = MXU_BF16 / 4          # multi-pass bf16 f32 dot_generals
VPU_F32 = 11.5e12
HBM_BPS = 819e9


# -------------------------------------------------- analytic FLOP counts
def sweep_group_step_flops(S=8, m=3, hz=30, n_params=8, n_act=128,
                           m_mpf=50, mpf_steps=20):
    """FLOPs for ONE step of the sweep megakernel (S solves), by
    section. Elementwise ops count rows*128 lanes (every lane is a real
    (scenario, param, action-sample, particle) tuple for the demo
    shapes: S*m*n_params rows x n_act=128 lanes); dot_generals count
    2*M*N*K. Counts are structural (+-20%): op tallies per line of the
    kernel body, not instruction traces."""
    sm, rows = S * m, n_params * S * m
    mp = -(-m_mpf // 8) * 8
    n_pair = (S + 1) // 2
    lane = 128
    fl = {}
    # hardware PRNG + draw plumbing: (hz*sm + 16*S) rows of normals
    # (~8 FLOPs each: bit twiddle + Box-Muller share) + masked selects
    fl["rng+draws"] = (hz * sm + 16 * S) * lane * 8 + 40 * sm * lane
    # SVMPC Silverman: row-batched bitonic sort, 8 rows x 128 lanes,
    # log2(128)^2/2 = 24.5 stages x ~6 ops, + median/1.349 glue
    fl["silverman"] = 8 * lane * 25 * 6 + 8 * lane * 10
    # rollouts: hz iterations x [rows, 128] x ~30 FLOPs/lane
    # (cost 6, clips 2, torque balance 7, rot_sincos ~9, rotation 6)
    fl["rollout"] = hz * rows * lane * 30
    # param average + DISCO softmaxes (~25 ops on [sm, 128]) +
    # hz-step eps accumulation (2 weighted row-dots per step)
    fl["disco"] = (n_params + 25) * sm * lane + hz * 5 * sm * lane
    # Stein + forward: 9 block matmuls [smp, smp] x [smp|128] + ~40
    # elementwise [smp, 128] ops
    smp = -(-sm // 8) * 8
    fl["stein"] = 9 * 2 * smp * smp * lane + 40 * smp * lane
    # MPF: mpf_steps x (~45 elementwise ops on the stacked
    # [n_pair*mp, 128] pairwise tiles + 6 per-pair-block row sums +
    # FOUR colbcast lane-broadcast matmuls [n_pair*mp, 128] x
    # [128, 128]) + the commit's two colbcasts + the MPF Silverman sort
    pr = n_pair * mp
    colbcast = 2 * pr * lane * lane + 3 * pr * lane
    fl["mpf_elementwise"] = mpf_steps * (45 + 6) * pr * lane \
        + 8 * lane * 25 * 6
    fl["mpf_colbcast_mxu"] = (4 * mpf_steps + 2) * colbcast
    fl["total"] = sum(fl.values())
    return fl


def particle_sweep_group_step_flops(S=8, m=6, hz=40, n_params=4,
                                    n_act=64, m_mpf=50, mpf_steps=20,
                                    n_occ_ops=30):
    """FLOPs for ONE step of the PARTICLE sweep megakernel (S solves,
    `ops/pallas_particle_sweep_episode.py`, demo shapes). Same counting
    discipline as `sweep_group_step_flops`: elementwise ops count
    rows*128 lanes, dot_generals 2*M*N*K, tallies are structural
    (+-20%). pack2 (n_act <= 64, n_params even) halves the rollout
    rows; `n_occ_ops` is the per-call occupancy-grid cost for the
    grid_4x4 preset after interval factoring (4+4 interval tests +
    border leftovers + clip/floor prep — ops/pallas_particle_rollout.py
    `occupancy_hit`)."""
    sm = S * m
    smp = -(-sm // 8) * 8
    pack2 = n_act <= 64 and n_params % 2 == 0 and n_params > 1
    npr = n_params // 2 if pack2 else n_params
    rows = npr * sm
    mp = -(-max(m_mpf, 8) // 8) * 8
    n_pair = (S + 1) // 2
    nmr = n_pair * mp
    lane = 128
    g_bw = 1
    while g_bw * 128 < m * hz * 2:
        g_bw *= 2
    fl = {}
    # hardware PRNG: (hz*2*smp + 16*S) rows of normals/uniforms
    # (~8 FLOPs each) + draw plumbing (x64 broadcast selects [8S, 128],
    # one-hot draw select, 2 masked lane-sum scatters to [rows, 128])
    fl["rng"] = (hz * 2 * smp + 16 * S) * lane * 8
    fl["draws"] = (8 * S * 10 + rows * 6) * lane
    # SVMPC Silverman: rr-major packing (~m + n_flat/64 single-vreg
    # roll+selects on [8, 128]) + grouped bitonic over [g*8, 128]
    # (sum_{i<=log2(g*128)} i stages x ~6 ops) + stats glue
    n_flat = m * hz * 2
    stages = sum(range(1, (g_bw * 128).bit_length()))
    fl["silverman"] = (m + n_flat // 64) * 8 * lane * 4 \
        + stages * 6 * g_bw * 8 * lane + 20 * g_bw * 8 * lane
    # rollouts: hz iterations x [rows, 128] x ~30 FLOPs/lane (cost 10,
    # action mirror+clips 8, physics 8, glue) — occupancy separate
    fl["rollout"] = (hz + 1) * rows * lane * 30
    # occupancy tests: one per rollout iteration + terminal (+ sim,
    # term, MPF-likelihood calls on [8, 1] columns — negligible adds)
    fl["occupancy"] = (hz + 1) * rows * lane * n_occ_ops
    # param fold + per-scenario DISCO beta + two softmaxes on [smp, 128]
    fl["disco"] = (npr + 2) * sm * lane + 100 * smp * lane
    # hz-step delta/glik accumulation: 4 row-dots + 4 selects per step
    fl["acc"] = hz * 12 * smp * lane
    # Stein + weighted GMM prior + forward selection: 8 block matmuls
    # [smp, smp] x [smp, 128|smp] + ~80 elementwise [smp, 128] ops
    fl["stein+forward"] = 8 * 2 * smp * smp * lane + 80 * smp * lane
    # MPF: mpf_steps x (~50 elementwise ops on the stacked [nmr, 128]
    # pairwise tiles + 6 per-pair-block row sums + THREE colbcast
    # lane-broadcast matmuls) + the commit/setup colbcasts
    colbcast = 2 * nmr * lane * lane + 3 * nmr * lane
    fl["mpf_elementwise"] = mpf_steps * (50 + 6) * nmr * lane \
        + 30 * 8 * lane
    fl["mpf_colbcast_mxu"] = (3 * mpf_steps + 3) * colbcast
    # simulator + termination + logs: [8, 1]/[8, 128] column physics,
    # 12-field scatter
    fl["sim+term+logs"] = 60 * 8 * lane + 24 * 8 * lane
    fl["total"] = sum(fl.values())
    return fl


def fused_mpf_update_flops(m=2048, d=2, steps=20):
    """FLOPs for one FusedMPF posterior update (ops/pallas_mpf.py):
    steps x (Gram build + kernel + two K-matmuls + score glue)."""
    per = (
        2 * m * m * d      # x @ x.T for pairwise distances
        + 6 * m * m        # d2 assembly + exp + mask
        + 2 * 2 * m * m * d  # K @ score, K @ x
        + 30 * m * d       # likelihood score, SGD glue
    )
    return {"per_svgd_step": per, "total": steps * per}


def sweep_group_bytes(S=8, m=3, hz=30, m_mpf=50, steps=200):
    """HBM bytes for a WHOLE sweep-megakernel episode (inputs once +
    logs once; all per-step state stays in VMEM)."""
    mp = -(-m_mpf // 8) * 8
    n_pair = (S + 1) // 2
    inputs = (3 * -(-S * m // 8) * 8 * 128 + n_pair * mp * 128
              + 3 * 8 * 128) * 4
    logs = (-(-steps // 8) * 8) * 128 * 4
    outs = (3 * -(-S * m // 8) * 8 * 128 + n_pair * mp * 128) * 4
    return inputs + logs + outs


# ------------------------------------------------------------- measure
def measure_sweep(steps=200, groups=16, repeats=3, n_sc=16,
                  n_chains=2):
    import jax
    import jax.numpy as jnp

    from dust_tpu.experiments import build_pendulum_stack, load_config
    from dust_tpu.simulation import megakernel_pendulum_sweep_fn

    config = load_config(ROOT / "demo/pendulum_config.yaml")
    stack = build_pendulum_stack(config, jax.random.key(0), case="dust")
    sweep = megakernel_pendulum_sweep_fn(
        stack, config["exp_params"], steps=steps, n_sc=n_sc,
        unroll=True, n_chains=n_chains,
    )
    lens = jnp.linspace(0.8, 1.2, n_sc)
    mass = jnp.linspace(0.9, 1.1, n_sc)

    @jax.jit
    def run_groups(seeds):
        return jax.lax.scan(
            lambda _, s: (0, sweep(s, lens, mass)["cost"]), 0, seeds
        )[1]

    def run(i):
        seeds = jnp.stack(
            [jnp.full((groups,), i, jnp.int32),
             jnp.arange(groups, dtype=jnp.int32) * 1000], axis=1
        )
        return run_groups(seeds)

    run(0).block_until_ready()
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        run(i + 1).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / (groups * steps)     # seconds per group-step


def measure_particle_sweep(steps=200, groups=8, repeats=3,
                           n_sc=8, n_chains=4):
    import jax
    import jax.numpy as jnp

    from dust_tpu.experiments import build_particle_stack, load_config
    from dust_tpu.simulation import megakernel_particle_sweep_fn

    config = load_config(ROOT / "demo/particle_config.yaml")
    stack = build_particle_stack(config, jax.random.key(0))
    sweep = megakernel_particle_sweep_fn(
        stack, config["exp_params"], steps=steps, n_sc=n_sc,
        unroll=True, n_chains=n_chains,
    )
    masses = jnp.linspace(1.6, 2.4, n_sc)

    @jax.jit
    def run_groups(seeds):
        return jax.lax.scan(
            lambda _, sd: (0, sweep(sd, masses)["cum"]), 0, seeds
        )[1]

    def run(i):
        seeds = jnp.stack(
            [jnp.full((groups,), i, jnp.int32),
             jnp.arange(groups, dtype=jnp.int32) * 1000], axis=1
        )
        return run_groups(seeds)

    run(0).block_until_ready()
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        run(i + 1).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / (groups * steps)     # seconds per group-step


def measure_fused_mpf(m, steps=20, repeats=3, chain=20):
    import jax
    import jax.numpy as jnp

    from dust_tpu.experiments import build_pendulum_stack, load_config
    from dust_tpu.inference.mpf import FusedMPF

    config = load_config(ROOT / "demo/pendulum_config.yaml")
    stack = build_pendulum_stack(config, jax.random.key(0), case="dust")
    import optax

    mpf = FusedMPF(likelihood=stack.mpf.likelihood,
                   optimizer=optax.sgd(1e-3))
    particles = jax.random.uniform(jax.random.key(0), (m, 2),
                                   minval=0.6, maxval=1.3)
    obs0 = stack.init_state
    mstate = mpf.init_state(particles, obs0, dim_a=1, bw=0.2)

    @jax.jit
    def chained(mstate):
        def body(ms, i):
            ms, _, _ = mpf.optimize(
                ms, jnp.array([0.5]), obs0, bw=0.3, n_steps=steps
            )
            return ms, ()

        ms, _ = jax.lax.scan(body, mstate, jnp.arange(chain))
        return ms

    jax.block_until_ready(chained(mstate))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(mstate))
        best = min(best, time.perf_counter() - t0)
    return best / chain                 # seconds per update


# recorded rates (SKIP_MEASURE path; refreshed whenever the script
# runs on hardware)
RECORDED = {        # measured r5 2026-08-21 on one v5e via the tunnel
    # SHIPPING shapes: pendulum S=16 x CH=2 joint-MPF (32 solves per
    # program-step, 2.13 us/solve at the 512-episode batch; 1.84 at
    # n=4096 CH=3 — chain_ladder probes), particle S=8 x CH=4
    # per-chain MPF (32 solves, 2.76 us/solve at the 256-episode
    # batch; 2.30 at n=2048)
    "sweep_group_step_s": 68.069e-6,
    "particle_group_step_s": 88.234e-6,
    "mpf2048_update_s": 2.786e-3,
    "mpf8192_update_s": 16.789e-3,
    "mpf32768_update_s": 134.635e-3,
}


def main():
    measured = {}
    if os.environ.get("SKIP_MEASURE") != "1":
        import jax

        assert jax.devices()[0].platform == "tpu", (
            "roofline measurement needs the TPU; "
            "set SKIP_MEASURE=1 for the analytic table"
        )
        measured["sweep_group_step_s"] = measure_sweep()
        measured["particle_group_step_s"] = measure_particle_sweep()
        measured["mpf2048_update_s"] = measure_fused_mpf(2048)
        measured["mpf8192_update_s"] = measure_fused_mpf(8192, chain=4)
        measured["mpf32768_update_s"] = measure_fused_mpf(32768,
                                                          chain=2)
    else:
        measured = dict(RECORDED)

    rows = []
    # sweep megakernel at the SHIPPING shape (r5): S=16 scenario tiles
    # x SWEEP_CH jointly-interleaved chains per program-step; the
    # analytic per-step count scales linearly in S and CH (every
    # section's tiles gain the scenario/chain factor)
    SWEEP_S, SWEEP_CH = 16, 2
    fl1 = sweep_group_step_flops(S=SWEEP_S)
    fl = {k: v * SWEEP_CH for k, v in fl1.items()}
    t = measured["sweep_group_step_s"]
    ach = fl["total"] / t
    ep_bytes = sweep_group_bytes(S=SWEEP_S) * SWEEP_CH
    useful = fl["total"] - fl["mpf_colbcast_mxu"]
    rows.append({
        "kernel": "sweep_megakernel_group_step",
        "flops": fl["total"],
        "flop_breakdown": {k: v for k, v in fl.items() if k != "total"},
        "seconds": round(t * 1e6, 3),
        "unit": f"us/group-step ({SWEEP_S * SWEEP_CH} solves, "
                f"S={SWEEP_S} x CH={SWEEP_CH})",
        "achieved_total_tflops": round(ach / 1e12, 3),
        # the colbcast matmuls are MXU data movement; only the rest is
        # useful math, so the MFU split is per-unit:
        "pct_mxu_f32_peak_total": round(100 * ach / MXU_F32, 2),
        "useful_math_tflops": round(useful / t / 1e12, 3),
        "pct_vpu_peak_useful": round(100 * useful / t / VPU_F32, 2),
        "hbm_bytes_per_200step_episode_group": ep_bytes,
        "hbm_gbps": round(ep_bytes / (t * 200) / 1e9, 4),
        "pct_hbm_peak": round(100 * ep_bytes / (t * 200) / HBM_BPS, 3),
        "binds": "MXU broadcast dispatches (colbcast) + serial "
                 "dependency chains; HBM idle (VMEM-resident)",
    })
    # particle sweep megakernel (VERDICT r3 #5; r5 shipping shape —
    # the particle ladder's winner is S=8 x CH=4, BASELINE
    # "r5 multi-chain verdict (particle)")
    PART_S, PART_CH = 8, 4
    flp = particle_sweep_group_step_flops(S=PART_S)
    fl = {k: v * PART_CH for k, v in flp.items()}
    t = measured["particle_group_step_s"]
    ach = fl["total"] / t
    useful = fl["total"] - fl["mpf_colbcast_mxu"]
    rows.append({
        "kernel": "particle_sweep_megakernel_group_step",
        "flops": fl["total"],
        "flop_breakdown": {k: v for k, v in fl.items() if k != "total"},
        "seconds": round(t * 1e6, 3),
        "unit": f"us/group-step ({PART_S * PART_CH} solves, "
                f"S={PART_S} x CH={PART_CH})",
        "achieved_total_tflops": round(ach / 1e12, 3),
        "pct_mxu_f32_peak_total": round(100 * ach / MXU_F32, 2),
        "useful_math_tflops": round(useful / t / 1e12, 3),
        "pct_vpu_peak_useful": round(100 * useful / t / VPU_F32, 2),
        "binds": "MXU broadcast dispatches (colbcast) + serial "
                 "dependency chains (hz=40 rollout/acc loops, "
                 "mpf_steps=20 loop); HBM idle (VMEM-resident)",
    })
    for m, key in ((2048, "mpf2048_update_s"),
                   (8192, "mpf8192_update_s"),
                   (32768, "mpf32768_update_s")):
        if key not in measured:
            continue
        fm = fused_mpf_update_flops(m)
        t = measured[key]
        ach = fm["total"] / t
        # matmuls dominate: contraction dim d=2 padded to the MXU's
        # 128-wide passes -> <2% MXU occupancy by construction
        rows.append({
            "kernel": f"fused_mpf_m{m}_update(20 SVGD steps)",
            "flops": fm["total"],
            "seconds": round(t * 1e3, 3),
            "unit": "ms/update",
            "achieved_tflops": round(ach / 1e12, 3),
            "pct_vpu_peak": round(100 * ach / VPU_F32, 2),
            "pct_mxu_f32_peak": round(100 * ach / MXU_F32, 2),
            "binds": "MXU occupancy (d=2 contraction in 128-wide "
                     "passes) + m^2 tile streaming through VMEM",
        })
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
