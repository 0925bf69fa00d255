"""Real spherical harmonics bases, degrees 0-4 (standard hardcoded real SH
polynomials; reference: utils/sh_utils.py:41-141).

Returned layout matches the common (l, m) ordering so SH coefficient grids
trained elsewhere remain compatible.
"""

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def eval_sh_bases(deg, dirs):
    """Evaluate SH bases at unit directions.

    Args:
      deg: static int in [0, 4].
      dirs: [..., 3] unit directions.

    Returns:
      [..., (deg+1)**2] basis values.
    """
    assert 0 <= deg <= 4
    ones = jnp.ones_like(dirs[..., 0])
    out = [C0 * ones]
    if deg > 0:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        out += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            out += [
                C2[0] * xy,
                C2[1] * yz,
                C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz,
                C2[4] * (xx - yy),
            ]
            if deg > 2:
                out += [
                    C3[0] * y * (3.0 * xx - yy),
                    C3[1] * xy * z,
                    C3[2] * y * (4.0 * zz - xx - yy),
                    C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                    C3[4] * x * (4.0 * zz - xx - yy),
                    C3[5] * z * (xx - yy),
                    C3[6] * x * (xx - 3.0 * yy),
                ]
                if deg > 3:
                    out += [
                        C4[0] * xy * (xx - yy),
                        C4[1] * yz * (3.0 * xx - yy),
                        C4[2] * xy * (7.0 * zz - 1.0),
                        C4[3] * yz * (7.0 * zz - 3.0),
                        C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
                        C4[5] * xz * (7.0 * zz - 3.0),
                        C4[6] * (xx - yy) * (7.0 * zz - 1.0),
                        C4[7] * xz * (xx - 3.0 * yy),
                        C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
                    ]
    return jnp.stack(out, axis=-1)


def eval_sh(deg, sh, dirs):
    """Contract SH coefficients [..., C, (deg+1)**2] with bases at dirs
    [..., 3] -> [..., C]."""
    basis = eval_sh_bases(deg, dirs)
    return jnp.sum(sh * basis[..., None, :], axis=-1)


def sh_render(viewdirs, features, deg=2):
    """SH shading head: features [..., 3*(deg+1)**2] -> rgb [..., 3]
    (reference utils/tensorf_utils.py:334-339: relu(sum + 0.5))."""
    n_basis = (deg + 1) ** 2
    basis = eval_sh_bases(deg, viewdirs)
    coeffs = features.reshape(features.shape[:-1] + (3, n_basis))
    rgb = jnp.sum(basis[..., None, :] * coeffs, axis=-1) + 0.5
    return jnp.maximum(rgb, 0.0)


def eval_sh_bases_cf(deg, dirs):
    """Channels-first SH bases: dirs [..., 3] -> [(deg+1)**2, ...] so the
    large batch axis stays on TPU lanes (see grid_sample_2d_cf)."""
    out = eval_sh_bases(deg, dirs)
    return jnp.moveaxis(out, -1, 0)


def sh_render_cf(viewdirs, features_cf, deg=2):
    """Channels-first SH shading: viewdirs [N, 3],
    features_cf [3*(deg+1)**2, N] -> rgb [N, 3]. All intermediates keep the
    N axis minor (lane dim)."""
    n_basis = (deg + 1) ** 2
    basis_cf = eval_sh_bases_cf(deg, viewdirs)      # [K, N]
    coeffs = features_cf.reshape(3, n_basis, -1)    # [3, K, N]
    rgb_cf = jnp.sum(coeffs * basis_cf[None], axis=1) + 0.5  # [3, N]
    return jnp.maximum(rgb_cf, 0.0).T
