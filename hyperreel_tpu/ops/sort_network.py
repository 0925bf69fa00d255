"""Fixed-width bitonic sorting network for per-ray z-sorts.

The reference sorts sample distances with `torch.sort` (reference
utils/intersect_utils.py:12-17). On TPU, XLA's variadic sort HLO is a
generic comparator loop; for the small static widths used per ray
(S = 16/32/64 intersections) a bitonic network compiled as
reshape + min/max + select is pure VPU work — no gathers, no
comparator calls — and fuses with the surrounding embedding math.

Only the last axis is sorted. Widths are padded to the next power of
two with +inf (ascending) so the padding sorts to the tail and is
sliced off.
"""

import numpy as np
import jax.numpy as jnp


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


def _passes(n):
    """(k, j) compare-exchange passes of the bitonic network for width n."""
    out = []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            out.append((k, j))
            j //= 2
        k *= 2
    return out


def _asc_mask(m, j, k):
    """Ascending-direction mask per 2j-block.

    Element index i = b*2j + (s*j + t); since j <= k/2 the bit `k` of i is
    fixed by the block base b*2j, so direction is constant per block.
    """
    base = np.arange(m) * (2 * j)
    return (base & k) == 0  # [m] numpy bool


def bitonic_sort(x, axis=-1):
    """Ascending values-only sort along `axis` via a bitonic network.

    Equivalent to jnp.sort(x, axis=axis) for float inputs without NaNs.
    """
    if axis != -1 and axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
        out = bitonic_sort(x, -1)
        return jnp.moveaxis(out, -1, axis)

    s = x.shape[-1]
    n = _next_pow2(s)
    if n != s:
        pad = jnp.full(x.shape[:-1] + (n - s,), jnp.inf, x.dtype)
        x = jnp.concatenate([x, pad], -1)

    lead = x.shape[:-1]
    for k, j in _passes(n):
        m = n // (2 * j)
        y = x.reshape(lead + (m, 2, j))
        a, b = y[..., 0, :], y[..., 1, :]
        asc = jnp.asarray(_asc_mask(m, j, k))[:, None]  # [m, 1]
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        na = jnp.where(asc, lo, hi)
        nb = jnp.where(asc, hi, lo)
        x = jnp.stack([na, nb], axis=-2).reshape(lead + (n,))
    return x[..., :s] if n != s else x


def bitonic_sort_with_payload(keys, payloads, axis=-1):
    """Sort `keys` ascending, carrying `payloads` (list of arrays whose
    sorted axis matches keys') through the same compare-exchanges.

    Replaces argsort + take_along_axis (a gather per payload) with select
    lanes. Payload arrays may have trailing channel dims; the sorted axis
    must be `axis` of keys mapped onto each payload's same position.
    Stable ordering is NOT guaranteed for equal keys (bitonic networks are
    unstable), matching what the z-sort needs (distances are continuous).
    """
    if axis != -1 and axis != keys.ndim - 1:
        keys_m = jnp.moveaxis(keys, axis, -1)
        pay_m = [jnp.moveaxis(p, axis, -1) for p in payloads]
        k_out, p_out = bitonic_sort_with_payload(keys_m, pay_m, -1)
        return (jnp.moveaxis(k_out, -1, axis),
                [jnp.moveaxis(p, -1, axis) for p in p_out])

    s = keys.shape[-1]
    n = _next_pow2(s)
    if n != s:
        pad = jnp.full(keys.shape[:-1] + (n - s,), jnp.inf, keys.dtype)
        keys = jnp.concatenate([keys, pad], -1)
        payloads = [
            jnp.concatenate(
                [p, jnp.zeros(p.shape[:-1] + (n - s,), p.dtype)], -1)
            for p in payloads]

    lead = keys.shape[:-1]
    for k, j in _passes(n):
        m = n // (2 * j)
        y = keys.reshape(lead + (m, 2, j))
        a, b = y[..., 0, :], y[..., 1, :]
        asc = jnp.asarray(_asc_mask(m, j, k))[:, None]
        # swap iff out of order for this block's direction
        swap = jnp.where(asc, a > b, a < b)
        na = jnp.where(swap, b, a)
        nb = jnp.where(swap, a, b)
        keys = jnp.stack([na, nb], axis=-2).reshape(lead + (n,))
        new_payloads = []
        for p in payloads:
            pl = p.shape[:-1]
            py = p.reshape(pl + (m, 2, j))
            pa, pb = py[..., 0, :], py[..., 1, :]
            # broadcast swap over payload dims between the key batch dims
            # and the sorted axis (e.g. [B, C, S] payloads for [B, S] keys)
            extra = pa.ndim - swap.ndim
            nl = len(lead)
            sw = swap.reshape(
                swap.shape[:nl] + (1,) * extra + swap.shape[nl:])
            npa = jnp.where(sw, pb, pa)
            npb = jnp.where(sw, pa, pb)
            new_payloads.append(
                jnp.stack([npa, npb], axis=-2).reshape(pl + (n,)))
        payloads = new_payloads

    if n != s:
        keys = keys[..., :s]
        payloads = [p[..., :s] for p in payloads]
    return keys, payloads
