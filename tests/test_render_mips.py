"""Mip-mapped texture sampling (scx.render.pipeline.MipTextures).

The reference renderer has no mips (sc_assets.cpp uploads level 0 only);
the software rasterizer adds them so minified sampling neither aliases nor
thrashes gathers.  Magnification must stay bit-identical to the plain
bilinear path."""

import jax.numpy as jnp
import numpy as np

from scx.assets import textures as tex
from scx.render import pipeline as pipe


def _gbuffer(uv, h, w):
    return {
        "depth": jnp.zeros((h, w), jnp.float32),
        "color": jnp.ones((h, w, 3), jnp.float32),
        "uv": jnp.asarray(uv, jnp.float32),
        "mat": jnp.zeros((h, w), jnp.int32),
        "covered": jnp.ones((h, w), bool),
    }


def _mats():
    return pipe.Materials(
        texture_id=jnp.zeros((1,), jnp.int32), tint=jnp.ones((1, 3))
    )


def test_mip_layout_and_chain():
    offsets, sizes = tex.mip_layout(8)
    assert sizes == [8, 4, 2, 1]
    assert offsets == [0, 64, 80, 84, 85]
    img = np.zeros((4, 4, 3), np.float32)
    img[:2, :2] = 1.0  # one white quadrant
    flat = tex.build_mip_chain(img)
    offs, szs = tex.mip_layout(4)
    assert flat.shape == (offs[-1], 3)
    lvl1 = flat[offs[1] : offs[2]].reshape(2, 2, 3)
    np.testing.assert_allclose(lvl1[0, 0], 1.0)  # 2x2 box of the white quad
    np.testing.assert_allclose(lvl1[1, 1], 0.0)
    lvl2 = flat[offs[2] : offs[3]].reshape(1, 1, 3)
    np.testing.assert_allclose(lvl2[0, 0], 0.25)  # global mean
    # quad rows: footprint of (v,u) holds its 4 clamped neighbours
    quads = tex.build_mip_quads(img)
    assert quads.shape == (offs[-1], 12)
    row = quads[1 * 4 + 1]  # base level texel (1,1)
    np.testing.assert_allclose(row[0:3], img[1, 1])
    np.testing.assert_allclose(row[3:6], img[1, 2])
    np.testing.assert_allclose(row[6:9], img[2, 1])
    np.testing.assert_allclose(row[9:12], img[2, 2])
    edge = quads[3 * 4 + 3]  # corner texel clamps all neighbours
    np.testing.assert_allclose(edge[0:3], img[3, 3])
    np.testing.assert_allclose(edge[9:12], img[3, 3])


def test_magnification_matches_plain_bilinear():
    rng = np.random.RandomState(3)
    base = rng.rand(16, 16, 3).astype(np.float32)
    h, w = 8, 8
    # uv spans an eighth of the texture: ~2 texels across 8 pixels -> level 0
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    uv = np.stack([0.3 + xx / w * 0.125, 0.4 + yy / h * 0.125], -1)
    g = _gbuffer(uv, h, w)
    plain = pipe.shade(g, _mats(), jnp.asarray(base)[None])
    mips = pipe.MipTextures(quads=jnp.asarray(tex.build_mip_quads(base))[None], size=16)
    mipped = pipe.shade(g, _mats(), mips)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(mipped), atol=1e-6)


def test_minification_hits_coarse_level():
    base = tex.checker_texture(64, cells=8)  # values 0.1 / 1.0, mean 0.55
    h, w = 8, 8
    # uv traverses the full texture across 2 pixels: 32 texels/pixel -> the
    # selected level must be far coarser than the 8px checker cells
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    uv = np.stack([xx * 0.5, yy * 0.5], -1) % 1.0
    g = _gbuffer(uv, h, w)
    mips = pipe.MipTextures(quads=jnp.asarray(tex.build_mip_quads(base))[None], size=64)
    out = np.asarray(pipe.shade(g, _mats(), mips))
    # every pixel near the checker mean, no aliased 0.1/1.0 point samples
    assert np.all(np.abs(out - 0.55) < 0.05)


def test_level_selection_monotone():
    h, w = 4, 16
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    covered = jnp.ones((h, w), bool)
    for scale, expect in [(1.0 / 64, 0), (4.0 / 64, 2), (16.0 / 64, 4)]:
        uv = jnp.asarray(np.stack([xx * scale, yy * scale], -1))
        lvl = pipe._uv_mip_level(uv, covered, 64, 7)
        # interior pixels (away from the clamped border diffs)
        assert int(lvl[1, 4]) == expect


def test_asset_manager_mip_pool():
    from scx.assets.residency import AssetManager, WHITE_SLOT

    am = AssetManager(pool_slots=4, slot_size=32)
    mt = am.device_pool_mips()
    assert isinstance(mt, pipe.MipTextures)
    offs, _ = tex.mip_layout(32)
    assert mt.quads.shape == (4, offs[-1], 12)
    # white slot: every level white
    np.testing.assert_allclose(np.asarray(mt.quads[WHITE_SLOT]), 1.0)


def test_trilinear_blends_adjacent_levels():
    """MipTextures(trilinear=True) lerps the two nearest levels: the output
    must lie between the two nearest-level shades and match nearest exactly
    when the footprint hits an integer level (sampler linear-mipmap parity,
    sc_assets.cpp:210-211)."""
    base = tex.checker_texture(64, cells=8)
    h, w = 8, 8
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # ~2.83 texels/pixel -> level log2(2.83) = 1.5: exactly between 1 and 2
    s = 2.0 ** 1.5 / 64.0
    uv = np.stack([xx * s, yy * s], -1)
    g = _gbuffer(uv, h, w)
    quads = jnp.asarray(tex.build_mip_quads(base))[None]
    near = pipe.MipTextures(quads=quads, size=64)
    tri = pipe.MipTextures(quads=quads, size=64, trilinear=True)
    out_n = np.asarray(pipe.shade(g, _mats(), near))
    out_t = np.asarray(pipe.shade(g, _mats(), tri))
    # fractional level -> trilinear differs from nearest somewhere interior
    assert np.abs(out_t[1:-1, 1:-1] - out_n[1:-1, 1:-1]).max() > 1e-4

    # integer level (exactly 2 texels/pixel -> level 1): identical outputs
    s1 = 2.0 / 64.0
    uv1 = np.stack([xx * s1, yy * s1], -1)
    g1 = _gbuffer(uv1, h, w)
    out_n1 = np.asarray(pipe.shade(g1, _mats(), near))
    out_t1 = np.asarray(pipe.shade(g1, _mats(), tri))
    np.testing.assert_allclose(out_t1[1:-1, 1:-1], out_n1[1:-1, 1:-1], atol=1e-6)


def test_anisotropic_sampling():
    """MipTextures(anisotropy=A): isotropic footprints are EXACTLY the
    1-tap path (n_taps==1 everywhere); anisotropic footprints pick the
    level from the SHORT axis, keeping detail the isotropic level blurs
    (sampler maxAnisotropy parity, sc_assets.cpp:210-211)."""
    base = tex.checker_texture(64, cells=8)
    quads = jnp.asarray(tex.build_mip_quads(base))[None]
    iso = pipe.MipTextures(quads=quads, size=64)
    ani = pipe.MipTextures(quads=quads, size=64, anisotropy=8)
    h, w = 8, 8
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    # isotropic footprint (2 texels/pixel both axes): identical outputs
    s = 2.0 / 64.0
    g = _gbuffer(np.stack([xx * s, yy * s], -1), h, w)
    out_i = np.asarray(pipe.shade(g, _mats(), iso))
    out_a = np.asarray(pipe.shade(g, _mats(), ani))
    np.testing.assert_allclose(out_a[1:-1, 1:-1], out_i[1:-1, 1:-1],
                               atol=1e-6)

    # 8:1 anisotropic footprint: 16 texels/pixel in u, 2 in v. The
    # isotropic path must go to level log2(16)=4 (uniform ~mean shade);
    # the aniso path samples level ~1 eight times along u, recovering the
    # 8-texel checker stripes along v (cells alternate every 4 v-pixels
    # at 2 texels/pixel).
    su, sv = 16.0 / 64.0, 2.0 / 64.0
    g2 = _gbuffer(np.stack([xx * su, yy * sv], -1), h, w)
    out_i2 = np.asarray(pipe.shade(g2, _mats(), iso))
    out_a2 = np.asarray(pipe.shade(g2, _mats(), ani))
    iso_spread = out_i2[1:-1, 1:-1].max() - out_i2[1:-1, 1:-1].min()
    ani_spread = out_a2[1:-1, 1:-1].max() - out_a2[1:-1, 1:-1].min()
    assert iso_spread < 0.12, iso_spread          # level-4 blur ~ flat
    assert ani_spread > 3 * iso_spread, (ani_spread, iso_spread)
