"""A/B harness behind SolverConfig.throughput(): forward-work knobs under
ladder_mode="always" + horizon sweep + gradient-agreement guard vs the
default solver knobs. Results table: benchmarks/README.md.

Usage: python benchmarks/ladder_ab.py [all|fwd|train|grad]
"""
import sys, time, dataclasses, json
import jax, jax.numpy as jnp
from nimblephysics_tpu.batched import LCP_REMAT_POLICY, BatchedEngine
from nimblephysics_tpu.models import half_cheetah

BATCH, INNER, REPEATS = 4096, 100, 3
world, q0, v0 = half_cheetah()
dtype = jnp.float32

def make_engine(pgs=0, refine=3, iters=32):
    eng = BatchedEngine(world)
    eng.meta = dataclasses.replace(
        eng.meta, seed_pgs_sweeps=pgs, refine_rounds=refine,
        iterations=iters)
    return eng

def init_qvz(eng):
    key = jax.random.PRNGKey(0)
    q = jnp.tile(jnp.asarray(q0, dtype)[:, None], (1, BATCH))
    q = q.at[1].add(jax.random.uniform(key, (BATCH,), dtype, -0.02, 0.02))
    v = jnp.tile(jnp.asarray(v0, dtype)[:, None], (1, BATCH))
    return q, v, jnp.zeros((eng.num_rows, BATCH), dtype)

KW = dict(ladder_mode="always")

def bench_fwd(tag, eng):
    na = world.action_size
    u = eng.action_to_forces(
        0.5 * jax.random.normal(jax.random.PRNGKey(0), (na, BATCH), dtype))
    @jax.jit
    def roll(c):
        def body(cc, _):
            q, v, z = cc
            r = eng.step(q, v, u, z_warm=z, **KW)
            return (r.q, r.v, r.impulses), None
        c2, _ = jax.lax.scan(body, c, None, length=INNER)
        return c2
    c = init_qvz(eng)
    c = roll(c); jax.block_until_ready(c)
    best = 1e9
    for _ in range(REPEATS):
        t0 = time.perf_counter(); c = roll(c); jax.block_until_ready(c)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"tag": "fwd_" + tag,
                      "steps_per_sec": round(BATCH * INNER / best)}),
          flush=True)
    return c

def make_policy():
    nv = world.num_dofs
    na = world.action_size
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    return {"w1": 0.1 * jax.random.normal(k1, (64, 2 * nv), dtype),
            "b1": jnp.zeros((64, 1), dtype),
            "w2": 0.1 * jax.random.normal(k2, (na, 64), dtype),
            "b2": jnp.zeros((na, 1), dtype)}

def policy(p, s):
    return p["w2"] @ jnp.tanh(p["w1"] @ s + p["b1"]) + p["b2"]

POL = jax.checkpoint_policies.save_from_both_policies(
    LCP_REMAT_POLICY, jax.checkpoint_policies.dots_saveable)

def train_fn(eng, horizon):
    def loss(p, q, v, z):
        def body(c, _):
            q, v, z = c
            s = jnp.concatenate([q, v], axis=0)
            u = eng.action_to_forces(policy(p, s))
            r = eng.step(q, v, u, z_warm=z, **KW)
            return (r.q, r.v, r.impulses), r.v[0]
        (qf, vf, zf), vels = jax.lax.scan(
            jax.checkpoint(body, policy=POL), (q, v, z), None,
            length=horizon)
        return -jnp.mean(vels)
    return loss

def bench_train(tag, eng, horizon):
    p = make_policy()
    vg = jax.jit(jax.value_and_grad(train_fn(eng, horizon)))
    q, v, z = init_qvz(eng)
    out = vg(p, q, v, z); jax.block_until_ready(out)
    best = 1e9
    for _ in range(REPEATS):
        t0 = time.perf_counter(); out = vg(p, q, v, z)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"tag": f"train_{tag}_H{horizon}",
                      "steps_per_sec": round(BATCH * horizon / best)}),
          flush=True)

def grad_agreement(tag, eng_test, eng_ref, horizon=10):
    p = make_policy()
    q, v, z = init_qvz(eng_ref)
    g_ref = jax.jit(jax.grad(train_fn(eng_ref, horizon)))(p, q, v, z)
    g_t = jax.jit(jax.grad(train_fn(eng_test, horizon)))(p, q, v, z)
    num = sum(float(jnp.vdot(a, b)) for a, b in
              zip(jax.tree_util.tree_leaves(g_ref),
                  jax.tree_util.tree_leaves(g_t)))
    n1 = sum(float(jnp.vdot(a, a)) for a in jax.tree_util.tree_leaves(g_ref))
    n2 = sum(float(jnp.vdot(a, a)) for a in jax.tree_util.tree_leaves(g_t))
    cos = num / max((n1 * n2) ** 0.5, 1e-30)
    print(json.dumps({"tag": "gradcos_" + tag, "cos": round(cos, 6)}),
          flush=True)

cfg = sys.argv[1] if len(sys.argv) > 1 else "all"
base = make_engine()
if cfg in ("all", "fwd"):
    bench_fwd("base", base)
    bench_fwd("refine2", make_engine(refine=2))
    bench_fwd("refine1", make_engine(refine=1))
    bench_fwd("it24", make_engine(iters=24))
    bench_fwd("it16", make_engine(iters=16))
    bench_fwd("refine2_it24", make_engine(refine=2, iters=24))
if cfg in ("all", "train"):
    bench_train("base", base, 50)
    bench_train("refine2", make_engine(refine=2), 50)
    bench_train("refine2_it24", make_engine(refine=2, iters=24), 50)
    bench_train("base", base, 100)
    bench_train("refine2_it24", make_engine(refine=2, iters=24), 100)
if cfg in ("all", "grad"):
    ref = make_engine(pgs=16)  # library default knobs
    grad_agreement("pgs0", base, ref)
    grad_agreement("refine2", make_engine(refine=2), ref)
    grad_agreement("refine2_it24", make_engine(refine=2, iters=24), ref)
