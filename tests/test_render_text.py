"""In-framebuffer debug text overlay (scx.render.debug_text)."""

import pytest
import jax.numpy as jnp
import numpy as np

from scx.render import debug_text as dt


def test_codes_and_font():
    codes = dt.text_to_codes("FPS 60\nOK", max_cols=8)
    assert codes.shape == (2, 8)
    assert codes[0, 0] == ord("F") - 32
    assert codes[0, 4] == ord("6") - 32
    assert codes[1, 2] == 0  # padded with spaces
    font = dt._font_table()
    assert font[ord("I") - 32].sum() > 5  # glyph actually drawn
    assert font[0].sum() == 0  # space is blank


def test_stamp_text_blends():
    rgb = jnp.full((64, 128, 3), 0.5, jnp.float32)
    codes = dt.text_to_codes("AB 12", max_cols=12)
    out = np.asarray(dt.stamp_text(rgb, codes, x=2, y=2))
    region = out[2 : 2 + 9, 2 : 2 + 12 * 6]
    assert region.max() == 1.0          # lit glyph pixels are white
    assert region.min() < 0.3           # dimmed backdrop behind text
    # outside the stamped region untouched
    np.testing.assert_allclose(out[30:, :], 0.5)


@pytest.mark.slow
def test_sandbox_overlay_text():
    from scx.app.sandbox import Sandbox
    from scx.core.config import EngineConfig

    import dataclasses

    cfg = EngineConfig()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, width=128, height=64, overlay_text=True
        ),
    )
    sb = Sandbox(cfg, capacity=64)
    rgb, t = sb.frame()
    rgb = np.asarray(rgb)
    # the overlay region contains pure-white glyph pixels
    assert (rgb[: 9 * 8, :128] == 1.0).any()
    sb.shutdown()


def test_viewer_ansi_and_input():
    from scx.app.viewer import TerminalInput, frame_to_ansi

    rgb = np.zeros((32, 64, 3), np.float32)
    rgb[:, :32] = [1.0, 0.0, 0.0]
    s = frame_to_ansi(rgb, cols=20)
    assert "\x1b[38;2;255;0;0m" in s and "▀" in s
    term = TerminalInput()  # stdin is not a tty under pytest -> inert pump
    assert term.pump() == (0.0, 0.0, 0.0, 0.0)
    term.close()
