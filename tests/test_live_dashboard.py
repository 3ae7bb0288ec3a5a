"""Live-dashboard (visdom-role) sink: server endpoints + Visualizer wiring.

The reference pushes live loss plots and image panels to a visdom server
(reference util/visualizer.py:216-221, :343-441); here the same role is an
in-process stdlib HTTP server (vts_tpu/utils/live.py), enabled by the same
flag surface (--display_id > 0, --display_port).
"""

import json
import os
import urllib.request

import numpy as np

from vts_tpu.utils.live import LiveDashboard, maybe_start
from vts_tpu.utils.visualizer import Visualizer


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_dashboard_endpoints(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    (img_dir / "epoch001_fake_I.png").write_bytes(b"\x89PNG fake")
    dash = LiveDashboard("ut", str(img_dir), port=0)
    try:
        dash.push_losses(1, 5, {"G_total": 1.5, "D_real_I": 0.7})
        dash.push_losses(1, 10, {"G_total": 1.25, "D_real_I": 0.72})
        dash.push_metrics(1, {"metric_I_PSNR": 21.0})
        dash.push_epoch_time(1, 12.5)
        dash.push_images(["epoch001_fake_I.png"])

        st, ct, body = _get(dash.url)
        assert st == 200 and "text/html" in ct and b"canvas" in body

        st, ct, body = _get(dash.url + "data.json")
        assert st == 200
        d = json.loads(body)
        assert d["epoch"] == 1
        assert [r["v"]["G_total"] for r in d["losses"]] == [1.5, 1.25]
        assert d["metrics"][0]["v"]["metric_I_PSNR"] == 21.0
        assert d["epoch_times"] == [[1, 12.5]]
        assert d["images"] == ["epoch001_fake_I.png"]

        st, ct, body = _get(dash.url + "images/epoch001_fake_I.png")
        assert st == 200 and body == b"\x89PNG fake"

        # path traversal stays inside img_dir; missing files are 404
        try:
            st, _, _ = _get(dash.url + "images/../../etc/passwd")
            assert st == 404
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        dash.close()


def test_visualizer_wires_dashboard(tmp_path):
    class Opt:
        name = "ut_live"
        checkpoints_dir = str(tmp_path)
        use_wandb = False
        no_html = False
        display_id = 1
        display_port = 0  # ephemeral
        display_winsize = 64

    vis = Visualizer(Opt())
    assert vis.dashboard is not None
    try:
        vis.print_current_losses(1, 4, {"G_total": 2.0}, 0.1, 0.0)
        vis.print_current_metrics(1, {"metric_T_MSE": 0.5})
        vis.display_current_results(
            {"fake_I": np.zeros((8, 8, 3), np.float32)}, epoch=1)
        vis.plot_epoch_time(1, 3.25)

        _, _, body = _get(vis.dashboard.url + "data.json")
        d = json.loads(body)
        assert d["losses"][0]["v"]["G_total"] == 2.0
        assert d["metrics"][0]["v"]["metric_T_MSE"] == 0.5
        assert d["epoch_times"] == [[1, 3.25]]
        assert d["images"] == ["epoch001_fake_I.png"]
        assert os.path.exists(
            os.path.join(str(tmp_path), "ut_live", "web", "images",
                         "epoch001_fake_I.png"))
    finally:
        vis.dashboard.close()


def test_display_id_zero_is_off(tmp_path):
    class Opt:
        name = "ut_off"
        display_id = 0
        display_port = 0

    assert maybe_start(Opt(), str(tmp_path)) is None
