"""Round-3 hardware probe N: minimal repro + workarounds for the
traced-potential-BC kernel fault at N=3679 (VERDICT r2 item 1).

probe_r3_b narrowed the sweep fault: a TRACED Dirichlet value on the
POTENTIAL field faults the worker at the shipped L_50_R_5 mesh —
per-lane CO2 values pass, per-lane voltage on a species field passes,
and ``lax.map`` (no vmap) faults too.  So the trigger is "psi-field BC
value is a traced tensor instead of a compile-time constant", not
batching.

Cases (each in its own subprocess):

  volt_single  : NO batching at all — one plain jitted 8-step scan with
                 the voltage as a traced jit argument.  If this faults,
                 the minimal repro has nothing to do with sweeps.
  barrier      : 2-lane vmap sweep; ``lax.optimization_barrier`` around
                 the blended BC values — stops XLA fusing the
                 value-blend into downstream kernels.
  vals_input   : 2-lane vmap sweep; the per-lane (N, nf) BC value ARRAY
                 is precomputed host-side and vmapped as a plain input —
                 the traced scalar never generates the array in-graph.
  barrier_u    : 2-lane vmap sweep; barrier on u after bc.project
                 instead (decouples the seed, not the residual path).

Run: python probes/probe_r3_n.py driver > /tmp/probe_r3_n.log 2>&1
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")


def log(msg):
    print(f"[probe] {msg}", flush=True)


def run_case(variant: str, lanes: int, steps: int):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.fem.dirichlet import ArithDirichletBC
    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    log(f"device: {jax.devices()[0]}  case: {variant} lanes={lanes} "
        f"steps={steps}")

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
        if variant == "vals_input":
            vals = (theta["bc_vals"]
                    * (1.0 - oh_co2) + theta["co2_s1"] * oh_co2)
            return ArithDirichletBC(base_bc.mask, base_bc.maskf, vals)
        vals = base_bc.values * (1.0 - oh_co2) + theta["co2_s1"] * oh_co2
        vals = vals * (1.0 - oh_v) + theta["voltage"] * oh_v
        if variant in ("barrier", "barrier_single"):
            vals = jax.lax.optimization_barrier(vals)
        bc = ArithDirichletBC(base_bc.mask, base_bc.maskf, vals)
        if variant == "barrier_u":
            return _BarrierProjBC(bc)
        return bc

    class _BarrierProjBC:
        def __init__(self, bc):
            self._bc = bc
            self.mask = bc.mask
            self.values = bc.values

        def apply_to_residual(self, r, u):
            return self._bc.apply_to_residual(r, u)

        def apply_to_jacobian(self, J):
            return self._bc.apply_to_jacobian(J)

        def project(self, u):
            return jax.lax.optimization_barrier(self._bc.project(u))

    newton = dataclasses.replace(cfg.newton, loop="while")
    step = make_implicit_step(prog.space, prog.form, newton, cfg.linear,
                              bc_of_theta=bc_of_theta)

    def single(u0_l, voltage, bc_vals=None):
        def body(carry, i):
            u, extra = carry
            th = prog._theta_of_carry((u, extra), i)
            th["voltage"] = voltage
            if bc_vals is not None:
                th["bc_vals"] = bc_vals
            u_new, st = step(u, th)
            return (u_new, extra), st.newton_iters

        (u, _), iters = jax.lax.scan(
            body, (u0_l, jnp.asarray(0.0)), jnp.arange(steps))
        return u, iters

    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    volts_np = np.linspace(-1.0, -2.5, lanes)

    if variant in ("volt_single", "barrier_single"):
        def run(u0, volt):
            return single(u0, volt)

        args = (u0, jnp.asarray(volts_np[-1]))
    elif variant == "vals_input":
        # per-lane BC value ARRAYS precomputed host-side; the swept
        # voltage never exists as an in-graph scalar blend
        vals_lanes = np.stack([
            np.asarray(base_bc.values) * (1.0 - oh_v) + v * oh_v
            for v in volts_np])
        u0v = jnp.stack([u0] * lanes)

        def run(u0v, vals_lanes):
            return jax.vmap(
                lambda a, bv: single(a, jnp.asarray(0.0), bc_vals=bv)
            )(u0v, vals_lanes)

        args = (u0v, jnp.asarray(vals_lanes))
    else:
        u0v = jnp.stack([u0] * lanes)
        volts = jnp.asarray(volts_np)

        def run(u0v, volts):
            return jax.vmap(single)(u0v, volts)

        args = (u0v, volts)

    t0 = time.perf_counter()
    cc = jax.jit(run).lower(*args).compile()
    t_compile = time.perf_counter() - t0

    u, iters = cc(*args)
    chk = float(jnp.abs(u).sum())
    assert chk == chk, "non-finite"
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        u, iters = cc(*args)
        float(jnp.abs(u).sum())
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    res = {
        "variant": variant, "lanes": lanes, "steps": steps, "N": N,
        "compile_s": round(t_compile, 1),
        "ms_per_lane_step": round(dt / (lanes * steps) * 1e3, 1),
        "total_s": round(dt, 2),
        "newton_iters": np.asarray(iters).reshape(
            -1, steps).sum(axis=1).tolist(),
    }
    print("RESULT " + json.dumps(res), flush=True)


def driver():
    here = os.path.abspath(__file__)
    results = {}

    def spawn(variant, lanes=2, steps=8, timeout=3000):
        key = f"{variant}-{lanes}"
        log(f"=== spawning {key} ===")
        try:
            p = subprocess.run(
                [sys.executable, here, variant, str(lanes), str(steps)],
                capture_output=True, text=True, timeout=timeout)
            out = p.stdout + p.stderr
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    results[key] = json.loads(line[len("RESULT "):])
                    log(f"{key}: {results[key]}")
                    return True
            tail = "\n".join(out.splitlines()[-6:])
            log(f"{key}: FAILED rc={p.returncode}\n{tail}")
            results[key] = {"error": f"rc={p.returncode}"}
        except subprocess.TimeoutExpired:
            log(f"{key}: TIMEOUT")
            results[key] = {"error": "timeout"}
        finally:
            with open("/tmp/probe_r3_n_results.json", "w") as f:
                json.dump(results, f, indent=1)
        return False

    single_faults = not spawn("volt_single", lanes=1)
    if single_faults:
        # minimal repro confirmed: test the barrier in the single shape
        # first (fastest signal on whether fusion is the culprit)
        spawn("barrier_single", lanes=1)
    ok_vals = spawn("vals_input")
    ok_barrier = spawn("barrier")
    if not ok_barrier and not ok_vals:
        spawn("barrier_u")
    if ok_vals:
        spawn("vals_input", lanes=4)
    if ok_barrier:
        spawn("barrier", lanes=4)
    log("driver done")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "driver":
        driver()
    else:
        run_case(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
