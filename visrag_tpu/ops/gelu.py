"""bf16-exact fast GELU (erf form) for the TPU VPU.

The reference vision tower uses exact-erf GELU (timm nn.GELU,
/root/reference/timm_modified/timm/models/vision_transformer.py:137,272 —
so400m does NOT use the tanh approximation). XLA's erf lowers to a wide
dual-branch polynomial + exp + divide chain; measured 4.8 ms per ViT MLP
activation (73728, 4304) bf16 on v5e — ~12% of the whole encode step.

This op replaces it with the cheapest fp32 pipeline that is still EXACT at
bf16 output precision (tests/test_ops_gelu.py sweeps all 65536 bf16 values
against float64 ground truth):

  u = x/sqrt(2), z = u**2
  central |u| <= 2:  gelu = 0.5*x*(1 + u*P8(z)),    P8 minimax, abs err 4e-7
  tail    |u| >  2:  erfc(t) = exp(-z) * G4(1/z) / (t*sqrt(pi)),  rel 1e-5
                     gelu(-|x|) = -0.5*|x|*erfc(|u|);  gelu(x) = x + gelu(-x)
                     for the positive side (gelu(x) - x is the mirrored tail)

Error budget: the worst relative error any branch contributes is ~1e-4 of
the OUTPUT value, vs bf16's 2**-9 = 2e-3 ulp — a 20x margin, so fp32
rounding noise (exp/rsqrt across backends) cannot flip the bf16 rounding
except at exact ties (none exist in the sweep).

The tanh approximation is NOT usable here: it differs from erf GELU on 322
of 65280 finite bf16 inputs (and is catastrophically wrong in the negative
tail where tanh saturates to exactly -1).

GRADIENT: autodiff differentiates the polynomial, not erf — the backward
pass is the derivative of the minimax fit, within ~1e-4 relative of the
exact gelu'(x) = Phi(x) + x*phi(x) (tested in tests/test_ops_gelu.py).
That is ~20x below bf16 resolution, fine for bf16 training; the polynomial
bwd is also cheaper than an exact-erf bwd would be. Use jax.nn.gelu
(approximate=False) if a future caller needs fp32-exact gradients.
"""

from __future__ import annotations

import jax.numpy as jnp

_INV_SQRT2 = 0.7071067811865476
_INV_SQRTPI = 0.5641895835477563

# erf(u)/u as P(z), z = u^2 in [0, 4]; Chebyshev-fit degree 8 (power basis),
# max abs err of u*P vs erf(u): 4.2e-7 on |u| <= 2
_P = (
    1.1283791196760364e+00, -3.7612431651315215e-01, 1.1282300699765989e-01,
    -2.6824713719124402e-02, 5.1657137248307280e-03, -8.0803314028007610e-04,
    9.7731370247008380e-05, -7.9901595871502000e-06, 3.2042480216770406e-07,
)
# erfc(t)*exp(t^2)*t*sqrt(pi) as G(v), v = 1/t^2 in (0, 0.25]; degree 4,
# max rel err 1.1e-5 on t in [2, 13.6]
_G = (
    9.9998651651214640e-01, -4.9841941141134580e-01, 6.9916115283273400e-01,
    -1.1679317367275996e+00, 1.1606819824090673e+00,
)


def _horner(z, coeffs):
    acc = jnp.float32(coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * z + jnp.float32(c)
    return acc


def fast_gelu(x):
    """Exact-erf GELU, computed in fp32, one rounding to x.dtype.

    Matches float64 0.5*x*(1+erf(x/sqrt(2))) after rounding to bfloat16 on
    every finite bf16 input. (+inf -> +inf, -inf -> -0, nan -> nan.)
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    u = xf * jnp.float32(_INV_SQRT2)
    z = u * u

    is_central = z <= jnp.float32(4.0)

    # central branch
    central = jnp.float32(0.5) * xf * (jnp.float32(1.0) + u * _horner(z, _P))

    # tail branch (evaluated at t = |u| > 2): erfc via exp(-z).
    # z clamped so the UNSELECTED branch stays finite under grad-of-where
    # (1/sqrt(z) at z→0 would poison the central branch's gradient).
    z = jnp.maximum(z, jnp.float32(4.0))
    inv_t = jnp.float32(1.0) / jnp.sqrt(z)
    v = inv_t * inv_t
    # multiply exp(-z) LAST: near the fp32 min-normal output boundary
    # (x ~ -13.1) an exp-first product chain underflows intermediates
    pre = (jnp.float32(-0.5) * jnp.abs(xf)) * (
        inv_t * jnp.float32(_INV_SQRTPI) * _horner(v, _G))
    g_neg = pre * jnp.exp(-z)
    tail = jnp.where(xf > 0, xf + g_neg, g_neg)
    # inf: z = inf -> exp(-z)=0, inv_t=0 -> g_neg = -0.5*inf*0 = nan; fix up
    tail = jnp.where(jnp.isinf(xf), jnp.where(xf > 0, xf, jnp.float32(-0.0)),
                     tail)

    out = jnp.where(is_central, central, tail)
    return out.astype(dtype)
