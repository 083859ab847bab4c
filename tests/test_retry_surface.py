"""render_frame_resilient retries only transient errors (round-2 verdict
weak #6): device/runtime failures are retried, deterministic programming
errors re-raise immediately."""

import pytest

from rayn_tpu.config import RenderSettings
from rayn_tpu.render import renderer
from rayn_tpu.scene import presets


def _scene():
    res = (8, 8)
    settings = RenderSettings(resolution=res, spp=1, max_bounces=0,
                              rays_per_pass=64)
    data, static, cam = presets.spheres_scene(resolution=res)
    return data, static, settings, cam


def test_transient_error_is_retried(monkeypatch):
    data, static, settings, cam = _scene()
    calls = []

    def hook(p):
        calls.append(p)
        if len(calls) == 1:
            raise RuntimeError("simulated device loss")

    monkeypatch.setattr(renderer, "_FAIL_HOOK", hook)
    film = renderer.render_frame_resilient(data, static, settings, cam,
                                           retries=2, frame=1)
    assert film is not None
    assert len(calls) >= 2  # first attempt failed, retry completed


def test_programming_error_not_retried(monkeypatch):
    data, static, settings, cam = _scene()
    calls = []

    def hook(p):
        calls.append(p)
        raise ValueError("bad settings")

    monkeypatch.setattr(renderer, "_FAIL_HOOK", hook)
    with pytest.raises(ValueError):
        renderer.render_frame_resilient(data, static, settings, cam,
                                        retries=3, frame=1)
    assert len(calls) == 1  # no retry on a deterministic error
