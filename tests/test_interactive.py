"""Interactive viewer: camera math + HTTP server round-trips (reference
lib/interactive/ equivalent; render function stubbed — model-integrated
rendering is covered by the runner tests)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from boostmvsnerfs_tpu.interactive.camera import (
    InteractiveCamera,
    RenderOptions,
)
from boostmvsnerfs_tpu.interactive.server import (
    ViewerState,
    make_server,
)


def _pose(angle=0.3, center=(1.0, 2.0, 3.0)):
    c, s = np.cos(angle), np.sin(angle)
    m = np.eye(4)
    m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]) @ np.diag(
        [1.0, 1.0, 1.0]
    )
    m[:3, 3] = center
    return m


def test_camera_pose_roundtrip():
    pose = _pose()
    cam = InteractiveCamera.from_pose(pose)
    got = cam.c2w()
    np.testing.assert_allclose(got, pose, atol=1e-9)
    # w2c inverts c2w
    np.testing.assert_allclose(cam.w2c() @ got, np.eye(4), atol=1e-9)


def test_camera_rotation_preserves_orthonormality():
    cam = InteractiveCamera.from_pose(_pose())
    for _ in range(5):
        cam.rotate(37.0, -12.0)
    R = cam.c2w()[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-9)


def test_camera_orbit_preserves_radius():
    cam = InteractiveCamera.from_pose(_pose())
    cam.origin = np.array([0.5, 0.5, 0.5])
    r0 = np.linalg.norm(cam.center - cam.origin)
    cam.rotate(80.0, 25.0, about_origin=True)
    r1 = np.linalg.norm(cam.center - cam.origin)
    assert abs(r0 - r1) < 1e-9
    assert np.linalg.norm(cam.center - _pose()[:3, 3]) > 1e-3  # it moved


def test_camera_pan_and_zoom_move_in_plane():
    cam = InteractiveCamera.from_pose(_pose(), )
    front0 = cam.front.copy()
    c0 = cam.center.copy()
    cam.pan(10.0, 0.0)
    np.testing.assert_allclose(cam.front, front0)  # direction unchanged
    assert abs(np.dot(cam.center - c0, front0)) < 1e-9  # in-plane
    cam.zoom(2.0)
    d = cam.center - c0
    # dolly moves along front
    assert np.dot(d, front0) > 0


def test_camera_path_playback():
    anchors = np.stack([_pose(a, (a, 0, 0)) for a in (0.0, 0.3, 0.6)])
    cam = InteractiveCamera.from_pose(anchors[0])
    cam.set_path(anchors, n=50)
    assert cam.has_path
    cam.goto_path(0.0)
    np.testing.assert_allclose(cam.c2w(), anchors[0], atol=1e-6)
    cam.play(0.5)
    assert cam.path_u == pytest.approx(0.5)
    mid = cam.center.copy()
    assert 0.0 < mid[0] < 0.6  # between the anchors


def _stub_render(calls):
    def render(c2w, opt):
        calls.append((np.asarray(c2w).copy(), opt.out_type, opt.level))
        if opt.out_type == "depth":
            return np.linspace(0, 1, 24 * 32).reshape(24, 32)
        return np.full((24, 32, 3), 128, np.uint8)

    return render


@pytest.fixture()
def viewer():
    calls = []
    cam = InteractiveCamera.from_pose(_pose())
    anchors = np.stack([_pose(a) for a in (0.0, 0.4)])
    cam.set_path(anchors, n=16)
    state = ViewerState(_stub_render(calls), cam, RenderOptions())
    server = make_server(state, port=0)  # ephemeral port
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, state, calls
    server.shutdown()
    server.server_close()


def _post(url, ev):
    req = urllib.request.Request(
        url + "/event", data=json.dumps(ev).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read(), r.headers.get("Content-Type")


def test_server_serves_page_and_meta(viewer):
    url, state, _ = viewer
    with urllib.request.urlopen(url + "/", timeout=10) as r:
        page = r.read().decode()
    assert "canvas" in page and "/event" in page
    with urllib.request.urlopen(url + "/meta", timeout=10) as r:
        meta = json.loads(r.read())
    assert meta["has_path"] is True
    assert meta["window_hw"] == [512, 512]


def test_server_event_renders_jpeg_and_moves_camera(viewer):
    url, state, calls = viewer
    c0 = state.camera.center.copy()
    body, ctype = _post(url, {"kind": "none"})
    assert ctype == "image/jpeg" and body[:2] == b"\xff\xd8"  # JPEG SOI
    _post(url, {"kind": "rotate", "dx": 30, "dy": 0, "orbit": False})
    _post(url, {"kind": "zoom", "amount": 1.0})
    assert np.linalg.norm(state.camera.center - c0) > 0
    assert len(calls) == 3


def test_server_options_and_depth_mode(viewer):
    url, state, calls = viewer
    _post(url, {"kind": "options", "out_type": "depth", "level": 0})
    assert state.options.out_type == "depth"
    assert state.options.level == 0
    assert calls[-1][1:] == ("depth", 0)
    body, ctype = _post(url, {"kind": "none"})
    assert ctype == "image/jpeg"  # depth colormapped then encoded


def test_server_play_advances_path(viewer):
    url, state, _ = viewer
    u0 = state.camera.path_u
    _post(url, {"kind": "play"})
    assert state.camera.path_u > u0
