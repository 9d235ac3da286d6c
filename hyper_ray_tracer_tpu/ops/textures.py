"""Branch-free texture evaluation.

Replaces the reference's `Texture` trait dispatch
(`/root/reference/src/textures/`) with masked all-compute over the texture
SoA, specialised by ``SceneStatic`` flags so scenes without noise/image
textures skip those (comparatively expensive) lanes entirely.

Semantics:
  solid    solid_color.rs:20-24
  checker  checker_texture.rs:22-30  (3-D sine product; children are the two
           inline solid colors — the only instantiation in the reference)
  noise    noise_texture.rs:25-31    (marble; NB the turbulence input is the
           *pre-scaled* point — a reference quirk vs the book)
  image    image_texture.rs:36-62    (nearest neighbour, u clamped, v
           flipped, edge clamp)
"""

from __future__ import annotations

import numpy as np

from ..models.scene import TT_CHECKER, TT_IMAGE, TT_NOISE
from . import perlin


def texture_value(textures, images, image_wh, perlin_tables, tex_idx,
                  u, v, point, static, xp, sf=None):
    """Evaluate texture colors for per-ray texture ids.

    tex_idx: [B] int32; u, v: [B]; point: [B,3].  Returns [B,3] float32.
    When ``sf`` (intersect.ShadeFields) is given the texture rows were
    already fetched by the winner's joined row gather and no table
    gathers run here (tex_idx may then be None).
    """
    if sf is not None:
        ttype = sf.ttype
        img_id_pre = sf.image_id
        c1 = sf.color1
        c2 = sf.color2
        scale_pre = sf.scale
    else:
        # Packed row gathers (intersect.pack_prim): 2 gathers instead of 9.
        ti = xp.stack([textures.ttype, textures.image_id], axis=-1)[tex_idx]
        tf = xp.concatenate(
            [textures.color1, textures.color2, textures.scale[:, None]],
            axis=-1,
        )[tex_idx]
        ttype = ti[..., 0]
        img_id_pre = ti[..., 1]
        c1 = tf[..., 0:3]
        c2 = tf[..., 3:6]
        scale_pre = tf[..., 6]

    value = c1  # TT_SOLID default; c1 is also the checker 'odd' color

    if static.has_checker_tex:
        sines = (
            xp.sin(10.0 * point[..., 0])
            * xp.sin(10.0 * point[..., 1])
            * xp.sin(10.0 * point[..., 2])
        )
        checker = xp.where((sines < 0.0)[..., None], c1, c2)
        value = xp.where((ttype == TT_CHECKER)[..., None], checker, value)

    if static.has_noise_tex:
        sp = scale_pre[..., None] * point
        turb = perlin.turbulence(perlin_tables, sp, xp)
        marble = 0.5 * (1.0 + xp.sin(sp[..., 2] + 10.0 * turb))
        noise_col = xp.stack([marble, marble, marble], axis=-1)
        value = xp.where((ttype == TT_NOISE)[..., None], noise_col, value)

    if static.has_image_tex:
        img_id = img_id_pre
        wh = image_wh[img_id]  # [B,2] (width, height)
        w = wh[..., 0].astype(np.float32)
        h = wh[..., 1].astype(np.float32)
        uu = xp.clip(u, 0.0, 1.0)
        vv = 1.0 - xp.clip(v, 0.0, 1.0)
        i = xp.minimum((uu * w).astype(np.int32), wh[..., 0] - 1)
        j = xp.minimum((vv * h).astype(np.int32), wh[..., 1] - 1)
        ni, ih, iw, _ = images.shape
        flat = images.reshape(ni * ih * iw, 3)
        texel = flat[(img_id * (ih * iw) + j * iw + i)]
        value = xp.where((ttype == TT_IMAGE)[..., None], texel, value)

    return value
