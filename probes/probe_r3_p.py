"""Round-3 hardware probe P: CHUNKED 4-lane voltage sweep at N=3679.

probe_r3_n established at the shipped L_50_R_5 mesh (N=3679):
  - single lane: 804 ms/step;
  - 2-lane vmap (barrier or vals_input): passes but 3030 ms/lane-step —
    7.5x the single-lane total per step (lockstep while-loop trip counts
    + VMEM pressure from the batched slab factorization);
  - 4-lane vmap: faults the worker for BOTH workarounds.

The chip is already saturated by one lane at this mesh size, so batching
lanes cannot win; the sweep should CHUNK.  Cases (own subprocess each):

  seq4    : lax.map (no batching) over 4 voltage lanes — one compiled
            program, lanes run sequentially, each at single-lane speed
            with its own Newton trip counts.  Expected ~800 ms/lane-step.
  chunk2  : lax.map over 2 chunks of vmap-2 — the middle ground.
  vmap4   : the faulting shape once more, capturing the full error text
            (is it a kernel fault or a VMEM OOM?).  RUN LAST — a worker
            crash poisons nothing since every case is its own process.

Run: python probes/probe_r3_p.py driver > /tmp/probe_r3_p.log 2>&1
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

LANES = 4
STEPS = 8


def log(msg):
    print(f"[probe] {msg}", flush=True)


def run_case(variant: str):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.fem.dirichlet import ArithDirichletBC
    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    log(f"device: {jax.devices()[0]}  case: {variant}")

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    N = prog.space.num_vertices
    nf, ns = cfg.n_fields, len(cfg.species)
    s2 = np.unique(
        prog.mesh.facets[prog.mesh.facet_markers == pore_3d.S2].reshape(-1))

    base_bc = prog.bc.arith()
    oh_co2 = np.zeros((N, nf)); oh_co2[prog.s1_verts, prog.idx["CO2"]] = 1.0
    oh_v = np.zeros((N, nf)); oh_v[s2, ns] = 1.0

    def bc_of_theta(theta):
        vals = base_bc.values * (1.0 - oh_co2) + theta["co2_s1"] * oh_co2
        vals = vals * (1.0 - oh_v) + theta["voltage"] * oh_v
        vals = jax.lax.optimization_barrier(vals)
        return ArithDirichletBC(base_bc.mask, base_bc.maskf, vals)

    newton = dataclasses.replace(cfg.newton, loop="while")
    step = make_implicit_step(prog.space, prog.form, newton, cfg.linear,
                              bc_of_theta=bc_of_theta)

    def single(u0_l, voltage):
        def body(carry, i):
            u, extra = carry
            th = prog._theta_of_carry((u, extra), i)
            th["voltage"] = voltage
            u_new, st = step(u, th)
            return (u_new, extra), st.newton_iters

        (u, _), iters = jax.lax.scan(
            body, (u0_l, jnp.asarray(0.0)), jnp.arange(STEPS))
        return u, iters

    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    # GMPNP_PROBE_VOLTS overrides the lane voltages (comma-separated) —
    # used to discriminate "4 lanes crash" from "these VALUES crash"
    env_v = os.environ.get("GMPNP_PROBE_VOLTS")
    if env_v:
        volts_np = np.asarray([float(x) for x in env_v.split(",")])
        lanes = len(volts_np)
    else:
        volts_np = np.linspace(-1.0, -2.5, LANES)
        lanes = LANES
    u0v = jnp.stack([u0] * lanes)
    volts = jnp.asarray(volts_np)

    if variant == "seq4":
        def run(u0v, volts):
            return jax.lax.map(lambda a: single(a[0], a[1]), (u0v, volts))
    elif variant == "single1":
        def run(u0v, volts):
            return single(u0v[0], volts[0])
    elif variant == "chunk2":
        def run(u0v, volts):
            u0c = u0v.reshape(lanes // 2, 2, N, nf)
            vc = volts.reshape(lanes // 2, 2)
            return jax.lax.map(
                lambda a: jax.vmap(single)(a[0], a[1]), (u0c, vc))
    elif variant == "vmap4":
        def run(u0v, volts):
            return jax.vmap(single)(u0v, volts)
    else:
        raise ValueError(variant)

    t0 = time.perf_counter()
    cc = jax.jit(run).lower(u0v, volts).compile()
    t_compile = time.perf_counter() - t0
    log(f"compiled in {t_compile:.1f}s")

    u, iters = cc(u0v, volts)
    chk = float(jnp.abs(u).sum())
    assert chk == chk, "non-finite"
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        u, iters = cc(u0v, volts)
        float(jnp.abs(u).sum())
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    res = {
        "variant": variant, "lanes": lanes, "steps": STEPS, "N": N,
        "volts": volts_np.tolist(),
        "compile_s": round(t_compile, 1),
        "ms_per_lane_step": round(dt / (lanes * STEPS) * 1e3, 1),
        "total_s": round(dt, 2),
        "newton_iters": np.asarray(iters).reshape(
            -1, STEPS).sum(axis=1).tolist(),
    }
    print("RESULT " + json.dumps(res), flush=True)


def driver():
    here = os.path.abspath(__file__)
    results = {}

    def spawn(variant, timeout=3600):
        log(f"=== spawning {variant} ===")
        try:
            p = subprocess.run(
                [sys.executable, here, variant],
                capture_output=True, text=True, timeout=timeout)
            out = p.stdout + p.stderr
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    results[variant] = json.loads(line[len("RESULT "):])
                    log(f"{variant}: {results[variant]}")
                    return True
            tail = "\n".join(out.splitlines()[-30:])
            log(f"{variant}: FAILED rc={p.returncode}\n{tail}")
            results[variant] = {"error": f"rc={p.returncode}",
                                "tail": tail[-1500:]}
        except subprocess.TimeoutExpired:
            log(f"{variant}: TIMEOUT")
            results[variant] = {"error": "timeout"}
        finally:
            with open("/tmp/probe_r3_p_results.json", "w") as f:
                json.dump(results, f, indent=1)
        return False

    spawn("seq4")
    spawn("chunk2")
    spawn("vmap4")   # known-faulting shape last: capture the full error
    log("driver done")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "driver":
        driver()
    else:
        run_case(sys.argv[1])
