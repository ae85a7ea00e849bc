"""Count VPU ops per RK4 march step by tracing the kernel bodies.

The honest-throughput accounting (VERDICT r4 item 1) needs a documented
flops-per-step figure to turn executed lane-steps/s into FLOP/s and a
VPU-utilization estimate.  Hand-counting a 150-line body is error-prone, so
this script traces the EXACT bodies the kernels run (`kernel._make_bh_body`,
`kernel_scene._make_march_body` on the demo-scene tables) on scalar state and
counts jaxpr equations by primitive.

Op accounting (documented in docs/tpu_cost_model.md):
  * add/sub/mul/min/max/select/compare/and/or/not/abs/neg: 1 VPU op each
    (the VPU has no general FMA fusion guarantee at this level, so ops are
    counted UNFUSED — utilization against the FMA-counted peak is therefore
    an UNDERestimate by up to 2x);
  * div/sqrt/rsqrt: ~7 ops (Newton-Raphson refinement sequences);
  * sin/cos: ~15 ops (range reduction + polynomial);
  * integer/bool bookkeeping and shape ops: 0 (negligible/elided).

Prints one JSON line: {"bh_ops_per_lane_step": N, "scene_ops_per_lane_step":
M, "counts": {...}}.
"""

import collections
import json
import pathlib
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

COST = {
    "div": 7.0, "sqrt": 7.0, "rsqrt": 7.0,
    "sin": 15.0, "cos": 15.0,
    "integer_pow": 2.0, "pow": 15.0,
}
ONE_OP = {
    "add", "sub", "mul", "max", "min", "select_n", "eq", "ne", "lt", "le",
    "gt", "ge", "and", "or", "not", "xor", "abs", "neg", "sign",
}
FREE = {
    "convert_element_type", "broadcast_in_dim", "reshape", "squeeze",
    "reduce_and", "reduce_or", "reduce_sum", "reduce_max", "reduce_min",
    "stop_gradient", "copy", "pjit", "custom_jvp_call", "custom_vjp_call",
    "transpose", "slice", "concatenate", "iota",
}


def count_ops(jaxpr):
    counts = collections.Counter()

    def walk(jx):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in ("pjit", "jit", "closed_call", "custom_jvp_call",
                        "custom_vjp_call", "remat", "checkpoint"):
                for sub in eqn.params.values():
                    if hasattr(sub, "jaxpr"):
                        walk(sub.jaxpr if hasattr(sub.jaxpr, "eqns")
                             else sub.jaxpr.jaxpr)
                continue
            counts[name] += 1

    walk(jaxpr.jaxpr)
    return counts


def weigh(counts):
    total, unknown = 0.0, []
    for name, n in counts.items():
        if name in COST:
            total += COST[name] * n
        elif name in ONE_OP:
            total += float(n)
        elif name not in FREE:
            unknown.append(name)
    return total, unknown


def main():
    from schwarzschild_tpu import configs
    from schwarzschild_tpu.kernel import _init_bh_state, _make_bh_body
    from schwarzschild_tpu.kernel_scene import (_init_march_state,
                                                _make_march_body,
                                                _pack_scene_smem)

    s = jnp.float32(0.5)
    state = _init_bh_state(s, s, jnp.float32(10.0), s, s, -s,
                           jnp.asarray(True))
    body = _make_bh_body(jnp.float32(1.0), max_steps=100,
                         max_angle=4 * 3.14159, u_f=0.01, with_exit=False)
    jx = jax.make_jaxpr(lambda st: body(jnp.int32(3), st))(state)
    bh_counts = count_ops(jx)
    bh_ops, bh_unknown = weigh(bh_counts)

    sc = configs.demo_scene()
    tables = {k: jnp.asarray(v) for k, v in _pack_scene_smem(sc).items()}
    table_rows = {k: int(v.shape[0]) for k, v in tables.items()}
    st2 = _init_march_state(s, s, jnp.float32(10.0), s, s, -s,
                            jnp.asarray(True), 4)
    body2 = _make_march_body(jnp.float32(1.0), tables, table_rows=table_rows,
                             n_slots=4, max_steps=100, max_angle=4 * 3.14159,
                             u_f=0.01, with_exit=False)
    jx2 = jax.make_jaxpr(lambda st: body2(jnp.int32(3), st))(st2)
    sc_counts = count_ops(jx2)
    sc_ops, sc_unknown = weigh(sc_counts)

    print(json.dumps({
        "bh_ops_per_lane_step": bh_ops,
        "scene_ops_per_lane_step": sc_ops,
        "bh_unknown_prims": sorted(set(bh_unknown)),
        "scene_unknown_prims": sorted(set(sc_unknown)),
        "bh_counts": dict(bh_counts),
        "scene_counts": dict(sc_counts),
    }))


if __name__ == "__main__":
    main()
