"""Live-visualization surface (viz.py — the reference's rviz publishers,
laserMapping.cpp:710-957, rendered headlessly)."""
import numpy as np
import pytest

from fastlivo_tpu import viz

mpl = pytest.importorskip("matplotlib")


def _fake_out(t, pos, pts=None):
    class O:  # minimal FrameOutput stand-in
        pass

    o = O()
    o.t = t
    o.pos = np.asarray(pos, float)
    o.iters = 3
    o.n_points = 0 if pts is None else len(pts)
    o.pts_world = pts
    return o


def test_live_viewer_renders_frames(tmp_path):
    v = viz.LiveViewer(tmp_path / "viz", every=2, per_frame=256)
    rng = np.random.default_rng(0)
    for k in range(5):
        pts = rng.uniform(-3, 3, (1000, 3)).astype(np.float32)
        v.update(_fake_out(0.1 * k, [0.01 * k, 0, 1], pts))
    frames = sorted((tmp_path / "viz").glob("frame_*.png"))
    assert len(frames) == 3  # frames 0, 2, 4
    latest = tmp_path / "viz" / "latest.png"
    assert latest.exists()
    for f in frames + [latest]:
        assert f.read_bytes()[:4] == viz._PNG_MAGIC
    # per-frame decimation: 1000-pt input capped at per_frame
    assert v._n_cloud == 5 * 256


def test_cloud_reservoir_bounded(tmp_path):
    v = viz.LiveViewer(tmp_path, every=1000, max_cloud=1000, per_frame=400)
    rng = np.random.default_rng(1)
    for _ in range(10):
        v.add_cloud(rng.uniform(-1, 1, (400, 3)))
    assert v._n_cloud <= 1000


def test_rgb_cloud_roundtrip(tmp_path):
    v = viz.LiveViewer(tmp_path, every=1)
    pts = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    rgb = np.array([[255, 0, 0], [0, 255, 0]], np.float32)
    v.add_cloud(pts, rgb)
    v._path.append(np.array([0.0, 0, 0, 0]))
    out = v.render()
    assert out.read_bytes()[:4] == viz._PNG_MAGIC


def test_playback_from_pos_log(tmp_path):
    # synthesize a 25-column pos_log.txt (logging_util.log_pos layout)
    log = tmp_path / "Log"
    log.mkdir()
    rows = []
    for k in range(12):
        r = np.zeros(22)
        r[0] = 0.1 * k
        r[4:7] = [0.05 * k, 0.02 * k, 1.0]
        rows.append(r)
    np.savetxt(log / "pos_log.txt", np.asarray(rows))
    n = viz.playback(log, tmp_path / "frames", every=4)
    assert n == 3
    assert (tmp_path / "frames" / "latest.png").exists()


def test_playback_with_pcd_background(tmp_path):
    from fastlivo_tpu.run import save_pcd

    log = tmp_path / "Log"
    log.mkdir()
    r = np.zeros((2, 22))
    r[1, 0] = 0.1
    r[:, 4:7] = [[0, 0, 1], [0.1, 0, 1]]
    np.savetxt(log / "pos_log.txt", r)
    rng = np.random.default_rng(2)
    pts = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    rgb = rng.uniform(0, 255, (500, 3)).astype(np.float32)
    save_pcd(tmp_path / "map.pcd", pts, rgb)
    n = viz.playback(log, tmp_path / "frames", every=1,
                     pcd=tmp_path / "map.pcd")
    assert n == 2


def test_pcd_rgb_roundtrip_exact(tmp_path):
    """save_pcd writes rgb as a TYPE-U packed integer; _load_pcd must
    decode the VALUE (not reinterpret float bits) — regression test."""
    from fastlivo_tpu.run import save_pcd

    pts = np.array([[1, 2, 3], [4, 5, 6]], np.float32)
    rgb = np.array([[255, 0, 0], [0, 255, 128]], np.float32)
    save_pcd(tmp_path / "c.pcd", pts, rgb)
    p2, r2 = viz._load_pcd(tmp_path / "c.pcd")
    np.testing.assert_allclose(p2, pts, atol=1e-3)
    np.testing.assert_array_equal(r2, rgb)


def test_pcd_single_point_and_truncated(tmp_path):
    from fastlivo_tpu.run import save_pcd

    save_pcd(tmp_path / "one.pcd", np.array([[1.0, 2.0, 3.0]], np.float32))
    p, r = viz._load_pcd(tmp_path / "one.pcd")
    assert p.shape == (1, 3) and r is None
    (tmp_path / "bad.pcd").write_bytes(b"VERSION 0.7\nFIELDS x y z\n")
    with pytest.raises(ValueError, match="truncated"):
        viz._load_pcd(tmp_path / "bad.pcd")


def test_rgb_background_keeps_live_colormap(tmp_path):
    """Colorless live clouds must keep the height colormap even after an
    rgb background chunk was added (per-point flag, not whole-cloud)."""
    v = viz.LiveViewer(tmp_path, every=1)
    v.add_cloud(np.array([[0, 0, 0.0]], np.float32),
                np.array([[10, 20, 30]], np.float32))
    v.add_cloud(np.array([[1, 1, 1.0]], np.float32))
    cloud = np.concatenate(v._cloud)
    assert cloud[0, 6] == 1.0 and cloud[1, 6] == 0.0
    assert v.render().exists()


def test_vio_robust_validated_at_load(tmp_path):
    from fastlivo_tpu.config import load_config

    y = tmp_path / "c.yaml"
    y.write_text(
        "common:\n  img_enable: 0\ncapacity:\n  vio_robust: hubar\n")
    with pytest.raises(ValueError, match="vio_robust"):
        load_config(str(y))


def test_intensity_pcd_roundtrip(tmp_path):
    """LIO-mode PCD is intensity-colored PointXYZI (reference README 4.1);
    the viewer decodes intensity to grayscale."""
    from fastlivo_tpu.run import save_pcd

    pts = np.array([[1, 2, 3], [4, 5, 6]], np.float32)
    inten = np.array([10.0, 200.0], np.float32)
    save_pcd(tmp_path / "i.pcd", pts, intensity=inten)
    txt = (tmp_path / "i.pcd").read_text()
    assert "FIELDS x y z intensity" in txt
    p2, r2 = viz._load_pcd(tmp_path / "i.pcd")
    np.testing.assert_allclose(p2, pts, atol=1e-3)
    np.testing.assert_allclose(r2[:, 0], inten, atol=1e-3)
    assert np.all(r2[:, 0] == r2[:, 1])


def test_pcd_binary_pointxyzrgb_float_bits(tmp_path):
    """Binary PCD in pcl::PointXYZRGB convention: TYPE F rgb whose
    float BITS hold the packed 0xRRGGBB value (_load_pcd's binary
    branch — previously only the ASCII writer's TYPE-U path was
    exercised)."""
    pts = np.array([[1.5, -2.0, 3.25], [0.0, 4.0, -1.0]], np.float32)
    rgb = np.array([[10, 200, 30], [255, 255, 0]], np.uint32)
    packed = ((rgb[:, 0] << 16) | (rgb[:, 1] << 8) | rgb[:, 2]).astype(
        np.uint32)
    rows = np.concatenate(
        [pts, packed.view(np.float32)[:, None]], axis=1
    ).astype(np.float32)
    hdr = (
        "# .PCD v0.7\nVERSION 0.7\nFIELDS x y z rgb\nSIZE 4 4 4 4\n"
        "TYPE F F F F\nCOUNT 1 1 1 1\nWIDTH 2\nHEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2\nDATA binary\n"
    )
    with open(tmp_path / "b.pcd", "wb") as f:
        f.write(hdr.encode())
        f.write(rows.tobytes())
    p2, r2 = viz._load_pcd(tmp_path / "b.pcd")
    np.testing.assert_allclose(p2, pts, atol=1e-6)
    np.testing.assert_array_equal(r2, rgb.astype(np.float32))
