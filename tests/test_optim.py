"""anyprecision_adamw: parity with plain AdamW, torch-oracle parity with the
reference AnyPrecisionAdamW, and the Kahan property that motivates it."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from visrag_tpu.training.optim import adamw_from_config, anyprecision_adamw


def _run(tx, params, grads_seq):
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


def _tree_rand(key, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.normal(k1, (8, 16), dtype),
            "b": jax.random.normal(k2, (16,), dtype)}


def test_fp32_states_match_optax_adamw():
    """fp32 states + no Kahan is exactly AdamW — validates the core math."""
    key = jax.random.PRNGKey(0)
    params = _tree_rand(key)
    grads = [_tree_rand(jax.random.PRNGKey(i + 1)) for i in range(5)]
    ours = anyprecision_adamw(1e-2, weight_decay=0.01,
                              momentum_dtype=jnp.float32,
                              variance_dtype=jnp.float32,
                              use_kahan_summation=False)
    ref = optax.adamw(1e-2, weight_decay=0.01)
    p1 = _run(ours, params, grads)
    p2 = _run(ref, params, grads)
    for k in params:
        np.testing.assert_allclose(p1[k], p2[k], rtol=1e-6, atol=1e-7)


def test_torch_oracle_parity():
    """5 steps vs the reference AnyPrecisionAdamW (AST-extracted, bf16
    states + Kahan) on fp32 params: our fp32-EMA variant tracks the
    reference's in-bf16 EMA within bf16 resolution."""
    torch = pytest.importorskip("torch")
    from ref_oracle import load_functions

    class _PT:  # PrecisionType.to_dtype stub
        @staticmethod
        def to_dtype(name):
            return {"bfloat16": torch.bfloat16,
                    "float32": torch.float32}[name]

    cls = load_functions(
        "src/rsgrpo/verl/utils/torch_functional.py", ["AnyPrecisionAdamW"],
        extra_ns={"torch": torch, "List": list, "Tuple": tuple,
                  "PrecisionType": _PT})["AnyPrecisionAdamW"]

    rng = np.random.RandomState(0)
    w0 = rng.randn(16, 8).astype(np.float32)
    grads = [rng.randn(16, 8).astype(np.float32) * 0.1 for _ in range(5)]

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = cls([tw], lr=1e-2, weight_decay=0.01)
    for g in grads:
        tw.grad = torch.tensor(g)
        opt.step()

    tx = anyprecision_adamw(1e-2, weight_decay=0.01)
    params = {"w": jnp.asarray(w0)}
    jp = _run(tx, params, [{"w": jnp.asarray(g)} for g in grads])
    # the reference runs its EMAs in bf16 arithmetic; ours stores bf16 but
    # computes fp32 — agreement is bounded by bf16 resolution of the states
    np.testing.assert_allclose(np.asarray(jp["w"]), tw.detach().numpy(),
                               rtol=0, atol=2e-3)


def test_kahan_accumulates_tiny_updates_on_bf16_params():
    """bf16 params + lr-scale deltas that individually round to zero: Kahan
    carries them; without it the param never moves (the reference's stated
    purpose, torch_functional.py:219-223)."""
    params = {"w": jnp.full((64,), 1.0, jnp.bfloat16)}
    # constant gradient → steady-state Adam step ≈ lr; pick lr so a single
    # step is far below bf16 ulp at 1.0 (≈ 0.0078)
    grads = [{"w": jnp.full((64,), 1.0, jnp.float32)}] * 400
    lr = 1e-5
    with_k = _run(anyprecision_adamw(lr, use_kahan_summation=True),
                  dict(params), grads)
    without_k = _run(anyprecision_adamw(lr, use_kahan_summation=False),
                     dict(params), grads)
    moved_k = float(jnp.mean(1.0 - with_k["w"].astype(jnp.float32)))
    moved_n = float(jnp.mean(1.0 - without_k["w"].astype(jnp.float32)))
    # fp32 reference trajectory: ~400 * lr total movement (bias correction
    # makes early steps slightly larger)
    assert moved_k > 300 * lr, f"Kahan path barely moved: {moved_k}"
    assert moved_n < moved_k / 4, (
        f"no-Kahan bf16 params moved {moved_n} — rounding should have "
        "swallowed most steps")


def test_bf16_states_converge_like_fp32():
    """Toy least-squares: bf16-state AdamW reaches the same loss basin."""
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.randn(32, 8).astype(np.float32))
    y = jnp.asarray(rng.randn(32).astype(np.float32))

    def loss_fn(p):
        return jnp.mean((A @ p["w"] - y) ** 2)

    def fit(tx, steps=300):
        p = {"w": jnp.zeros((8,), jnp.float32)}
        state = tx.init(p)
        for _ in range(steps):
            g = jax.grad(loss_fn)(p)
            u, state = tx.update(g, state, p)
            p = optax.apply_updates(p, u)
        return float(loss_fn(p))

    l_fp32 = fit(adamw_from_config(3e-2, state_dtype="float32"))
    l_bf16 = fit(adamw_from_config(3e-2, state_dtype="bfloat16"))
    assert l_bf16 < l_fp32 * 1.05 + 1e-3, (l_bf16, l_fp32)


def test_state_dtypes_and_memory():
    tx = adamw_from_config(1e-3, state_dtype="bfloat16")
    params = {"w": jnp.zeros((4, 4), jnp.bfloat16)}
    state = tx.init(params)
    leaves = jax.tree_util.tree_leaves(state)
    dtypes = {l.dtype for l in leaves if hasattr(l, "dtype") and l.ndim > 0}
    assert dtypes == {jnp.dtype(jnp.bfloat16)}, dtypes
    with pytest.raises(ValueError):
        adamw_from_config(1e-3, state_dtype="float16")


def test_init_preserves_param_sharding():
    """tx.init must inherit the params' FSDP shardings (zeros_like, not
    zeros(shape)): plain zeros would materialize the whole bf16 state tree
    on one device — an init-time OOM for the models this optimizer exists
    to fit."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()), ("data",))
    p = jax.device_put(jnp.zeros((8, 16), jnp.bfloat16),
                       NamedSharding(mesh, P("data", None)))
    tx = anyprecision_adamw(1e-2)
    state = tx.init({"w": p})
    for leaf in (state.mu["w"], state.nu["w"], state.comp["w"]):
        assert leaf.sharding == p.sharding, leaf.sharding


def test_schedule_alignment_matches_optax():
    """The lr schedule is evaluated at the PRE-increment count (optax
    convention): with a warmup starting at 0.0, the first step must be a
    no-op for BOTH state_dtype configs — flipping the memory knob must not
    shift the lr trajectory by one step."""
    sched = optax.linear_schedule(0.0, 1e-2, 10)
    params = _tree_rand(jax.random.PRNGKey(0))
    grads = _tree_rand(jax.random.PRNGKey(1))
    for tx in (optax.adamw(sched), anyprecision_adamw(sched)):
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        for k in params:
            np.testing.assert_allclose(np.asarray(new[k]),
                                       np.asarray(params[k]), atol=1e-7)
