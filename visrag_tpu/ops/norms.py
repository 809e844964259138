"""Fused LayerNorm / RMSNorm Pallas kernels.

XLA's default lowering of the fp32-upcast norm chain round-trips HBM several
times (measured ~8× off the bandwidth ceiling on v5e for the ViT shapes);
these kernels do one read + one write per row block. Backward recomputes via
plain XLA ops (norms are a tiny fraction of backward time).

Both match the reference semantics: RMSNorm as modeling_minicpm.py:126-140
(fp32 accumulate, weight multiply, cast back); LayerNorm as torch
nn.LayerNorm(eps) used by the ViT/resampler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rows_blocks(total_rows: int) -> int:
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if total_rows % cand == 0:
            return cand
    return total_rows


def _rms_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:, :].astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    o_ref[:, :] = (y * w_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:, :].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(jnp.square(xc), axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    o_ref[:, :] = (y * w_ref[0, :].astype(jnp.float32) +
                   b_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


def _run_rows_kernel(kernel, x2, params, eps, interpret):
    rows, d = x2.shape
    br = _rows_blocks(rows)
    n_in = len(params)
    in_specs = [pl.BlockSpec((br, d), lambda i: (i, 0))]
    in_specs += [pl.BlockSpec((1, d), lambda i: (0, 0))] * n_in
    return pl.pallas_call(
        functools.partial(kernel, eps=eps),
        grid=(rows // br,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, *[p.reshape(1, d) for p in params])


def _rmsnorm_xla(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(x.dtype)


def _layernorm_xla(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _rmsnorm_core(x, w, eps, interpret):
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    return _run_rows_kernel(_rms_kernel, x2, (w,), eps, interpret).reshape(shape)


def _rms_fwd(x, w, eps, interpret):
    return _rmsnorm_core(x, w, eps, interpret), (x, w)


def _rms_bwd(eps, interpret, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x, w: _rmsnorm_xla(x, w, eps), x, w)
    return vjp(g)


_rmsnorm_core.defvjp(_rms_fwd, _rms_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _layernorm_core(x, w, b, eps, interpret):
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    return _run_rows_kernel(_ln_kernel, x2, (w, b), eps, interpret).reshape(shape)


def _ln_fwd(x, w, b, eps, interpret):
    return _layernorm_core(x, w, b, eps, interpret), (x, w, b)


def _ln_bwd(eps, interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x, w, b: _layernorm_xla(x, w, b, eps), x, w, b)
    return vjp(g)


_layernorm_core.defvjp(_ln_fwd, _ln_bwd)


def _pallas_ok(x, interpret):
    import math
    if jax.default_backend() != "tpu" and not interpret:
        return False
    rows = math.prod(x.shape[:-1])
    return x.shape[-1] % 128 == 0 and rows % 8 == 0


def rmsnorm(x, w, eps: float = 1e-5, interpret: bool = False):
    """(..., D) RMSNorm. Pallas on TPU, XLA elsewhere."""
    if not _pallas_ok(x, interpret):
        return _rmsnorm_xla(x, w, eps)
    return _rmsnorm_core(x, w, eps, interpret)


def layernorm(x, w, b, eps: float = 1e-6, interpret: bool = False):
    """(..., D) LayerNorm. Pallas on TPU, XLA elsewhere."""
    if not _pallas_ok(x, interpret):
        return _layernorm_xla(x, w, b, eps)
    return _layernorm_core(x, w, b, eps, interpret)
