"""CLI tool tests: launcher command generation, metric compiler, postprocess."""

import json
import os
import pickle

import numpy as np

from vts_tpu.launch import DEFAULT_MATERIALS, METHOD_PRESETS, main as launch_main
from vts_tpu.postprocess import postprocess_gz
from vts_tpu.utils.compile_metrics import compile_metrics_for_exp, format_table
from vts_tpu.utils.image_pool import ImagePool
from vts_tpu.utils.misc import upload_metrics_table


def test_launcher_commands_mode(capsys):
    rc = launch_main(["ours", "commands", "--materials", "GreenTee,BlackJean"])
    out = capsys.readouterr().out
    assert rc == 0
    lines = [l for l in out.strip().splitlines() if "vts_tpu.train" in l]
    assert len(lines) == 2
    assert "--model sinskit" in lines[0]
    assert "GreenTee_sinskitG_baseline_ours" in lines[0]
    assert "BlackJean" in lines[1]


def test_default_materials_is_touchclothing_20():
    assert len(DEFAULT_MATERIALS) == 20
    assert "GreenTee" in DEFAULT_MATERIALS
    assert set(METHOD_PRESETS) >= {"ours", "pix2pix", "pix2pixhd", "spade", "skit"}


def test_metric_compiler_rollup(tmp_path):
    for mat, lpips_v in (("A", 0.1), ("B", 0.3)):
        d = tmp_path / f"{mat}_m" / "test_best"
        d.mkdir(parents=True)
        with open(d / "eval_metrics.pkl", "wb") as f:
            pickle.dump({"metric_I_LPIPS": lpips_v, "metric_I_PSNR": 20.0}, f)
    table = compile_metrics_for_exp(str(tmp_path), ["A", "B", "C"], "{material}_m",
                                    phase="test", epoch="best")
    assert "C" not in table
    assert table["MEAN"]["I_LPIPS"] == 0.2
    text = format_table(table)
    assert "I_LPIPS" in text and "MEAN" in text


def test_postprocess_modes():
    rng = np.random.default_rng(0)
    gx = rng.normal(size=(64, 64)).astype(np.float32) * 0.3
    gy = rng.normal(size=(64, 64)).astype(np.float32) * 0.3
    for mode in ("equalize", "log10", "exp2", "linear", "dilation"):
        gz = postprocess_gz(gx, gy, mode=mode, out_size=(80, 128))
        assert gz.shape == (80, 128)
        assert 0.0 <= gz.min() and gz.max() <= 1.0


def test_image_pool_swap_semantics():
    pool = ImagePool(pool_size=4, seed=0)
    batches = [np.full((2, 4, 4, 1), i, np.float32) for i in range(6)]
    outs = [pool.query(b) for b in batches]
    # first two batches fill the pool unchanged
    np.testing.assert_array_equal(outs[0], batches[0])
    np.testing.assert_array_equal(outs[1], batches[1])
    # pool size never exceeds the cap
    assert len(pool.images) == 4
    # pass-through pool
    p0 = ImagePool(pool_size=0)
    np.testing.assert_array_equal(p0.query(batches[3]), batches[3])


def test_metrics_csv_fallback(tmp_path):
    path = upload_metrics_table([{"a": 1.0, "b": 2.0}], "sheet", out_dir=str(tmp_path))
    assert os.path.exists(path)
    assert "a,b" in open(path).read()


def test_init_multihost_noop_and_arg_assembly(monkeypatch):
    """--multihost plumbing (jax.distributed.initialize): no-op when unset,
    explicit coordination kwargs forwarded when given, auto-detect otherwise."""
    import argparse

    import jax

    from vts_tpu.platform import init_multihost

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))

    opt = argparse.Namespace(multihost=False)
    assert init_multihost(opt) is False
    assert calls == []

    opt = argparse.Namespace(multihost=True, coordinator_address="h0:1234",
                             num_processes=4, process_id=2)
    assert init_multihost(opt) is True
    assert calls == [{"coordinator_address": "h0:1234",
                      "num_processes": 4, "process_id": 2}]

    opt = argparse.Namespace(multihost=True, coordinator_address="",
                             num_processes=-1, process_id=-1)
    assert init_multihost(opt) is True
    assert calls[-1] == {}  # TPU-pod auto-detect path


def test_comparison_html(tmp_path, capsys):
    """launch.py phase=compare builds a side-by-side gallery across methods
    (reference tmux_launcher.py:197-226) from the results tree."""
    results = tmp_path / "results"
    # fake two methods' test outputs for one garment
    for suffix in ("sinskitG_baseline_ours", "pix2pixHD_baseline"):
        d = results / f"BlackJean_{suffix}" / "test_best" / "images"
        d.mkdir(parents=True)
        (d / "sample0_fake_I.png").write_bytes(b"png")
    # one method has an extra image -> other column renders an empty cell
    (results / "BlackJean_sinskitG_baseline_ours" / "test_best" / "images"
     / "sample1_fake_I.png").write_bytes(b"png")

    rc = launch_main(["ours", "compare", "--against", "pix2pixhd",
                      "--materials", "BlackJean",
                      "--results_dir", str(results)])
    assert rc == 0
    page = results / "comparison_BlackJean" / "index.html"
    assert page.exists()
    html = page.read_text()
    assert "sample0_fake_I.png" in html and "sample1_fake_I.png" in html
    assert html.count("&mdash;") == 1  # the missing pix2pixHD sample1 cell
    assert "ours" in html and "pix2pixhd" in html
    # relative paths resolve from the comparison dir
    assert "../BlackJean_sinskitG_baseline_ours/test_best/images/" in html


def test_comparison_html_filter(tmp_path):
    from vts_tpu.utils.compare import create_comparison_html
    d1 = tmp_path / "a"; d1.mkdir()
    (d1 / "x_fake_I.png").write_bytes(b"p")
    (d1 / "x_fake_T.png").write_bytes(b"p")
    out = create_comparison_html(str(tmp_path / "web"), [str(d1)], ["m"],
                                 name_filter="fake_I")
    html = open(out).read()
    assert "x_fake_I.png" in html and "x_fake_T.png" not in html
