"""Step checkpointing and resumable transients.

The reference has no checkpoint/resume: state lives in ``u_n`` in memory and
all outputs are written only after the loop, so a diverged Newton or a
preempted job loses everything (SURVEY.md §5).  Here the transient runs in
chunks of ``chunk`` scan steps with an orbax checkpoint of (solution, extra
carry, step index, config hash) between chunks; ``resume`` restarts from the
latest checkpoint and refuses configs whose hash changed.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, is_dataclass
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def config_hash(cfg: Any) -> str:
    """Stable hash of a (dataclass) config, ignoring non-physics fields."""
    if is_dataclass(cfg):
        d = asdict(cfg)
    else:
        d = dict(cfg)
    blob = json.dumps(d, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


class TransientCheckpointer:
    """Orbax-backed chunked checkpointing around ``run_transient``-style
    scans."""

    def __init__(self, ckpt_dir: str, cfg: Any = None):
        import orbax.checkpoint as ocp

        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.mgr = ocp.CheckpointManager(self.dir)
        self.hash = config_hash(cfg) if cfg is not None else None

    def save(self, step_idx: int, carry) -> None:
        import orbax.checkpoint as ocp

        self.mgr.save(step_idx, args=ocp.args.Composite(
            carry=ocp.args.StandardSave(jax.tree.map(np.asarray, carry)),
            meta=ocp.args.JsonSave(
                {"step": step_idx, "config_hash": self.hash or ""}),
        ))
        self.mgr.wait_until_finished()

    def latest(self) -> Optional[Tuple[int, Any]]:
        import orbax.checkpoint as ocp

        step = self.mgr.latest_step()
        if step is None:
            return None
        restored = self.mgr.restore(step, args=ocp.args.Composite(
            carry=ocp.args.StandardRestore(),
            meta=ocp.args.JsonRestore(),
        ))
        meta = restored["meta"]
        if self.hash and meta.get("config_hash") not in ("", self.hash):
            raise ValueError(
                f"checkpoint at {self.dir} was produced by a different "
                f"config (hash {meta.get('config_hash')} != {self.hash})")
        return int(meta["step"]), restored["carry"]

    def close(self):
        self.mgr.close()


def run_transient_checkpointed(
    step: Callable,
    carry0,
    n_steps: int,
    ckpt: TransientCheckpointer,
    chunk: int = 100,
    update_carry: Optional[Callable] = None,
    theta_of_carry: Optional[Callable] = None,
    step_state_init: Optional[Callable] = None,
):
    """Chunked resumable transient: scan ``chunk`` steps, checkpoint,
    repeat.  Returns (final_carry, ys) with ys concatenated over chunks
    (history of completed chunks before a resume is not re-materialized —
    consumers needing full history should re-run post hoc or keep chunk
    outputs).

    ``step_state_init``: opts into the stateful step protocol of
    ``timeloop.make_carried_step`` — called as
    ``step_state_init(carry, start_index) -> state`` once before the
    first chunk (after any checkpoint restore), and the state is threaded
    across chunks in memory.  The state is DERIVED data (a factorization
    of the current Jacobian) and is deliberately NOT persisted: a resume
    rebuilds it, keeping checkpoints identical to the stateless layout.
    """
    from gmpnp_tpu.solve.timeloop import run_transient

    def _tuplify(x):
        # orbax restores tuples as lists; restore the carry pytree structure
        if isinstance(x, (list, tuple)):
            return tuple(_tuplify(v) for v in x)
        if isinstance(x, dict):
            return {k: _tuplify(v) for k, v in x.items()}
        return jnp.asarray(x)

    start = 0
    carry = carry0
    latest = ckpt.latest()
    if latest is not None:
        start, carry = latest
        carry = _tuplify(carry)

    state = None
    if step_state_init is not None and start < n_steps:
        state = step_state_init(carry, start)

    ys_chunks = []
    i = start
    while i < n_steps:
        k = min(chunk, n_steps - i)
        offset = i

        def theta_shifted(c, j, _offset=offset):
            if theta_of_carry is None:
                return None
            return theta_of_carry(c, j + _offset)

        def update_shifted(extra, u, j, _offset=offset):
            if update_carry is None:
                return extra
            return update_carry(extra, u, j + _offset)

        carry, ys = run_transient(
            step, carry, k,
            update_carry=update_shifted,
            theta_of_carry=theta_shifted,
            step_state0=state)
        if state is not None:
            u_c, extra_c, state = carry
            carry = (u_c, extra_c)
        ys_chunks.append(jax.tree.map(np.asarray, ys))
        i += k
        ckpt.save(i, carry)

    if not ys_chunks:
        return carry, None
    ys = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *ys_chunks)
    return carry, ys
