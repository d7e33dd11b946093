"""scripts/compare_results.py — the BASELINE.md 1%-parity acceptance check."""

import importlib.util
import json
from pathlib import Path

_SPEC = importlib.util.spec_from_file_location(
    "compare_results",
    Path(__file__).resolve().parents[1] / "scripts" / "compare_results.py")
compare_results = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(compare_results)


def _write(tmp_path, name, res):
    p = tmp_path / name
    p.write_text(json.dumps(res))
    return str(p)


def _results(psnr=30.0, ssim=0.9, lpips=0.05, frames=3, **extra):
    res = {m: {"mean": v, "framewise": [v] * frames}
           for m, v in (("psnr", psnr), ("ssim", ssim), ("lpips", lpips))}
    res.update(extra)
    return res


def test_pass_within_tolerance(tmp_path, capsys):
    ours = _write(tmp_path, "ours.json", _results(psnr=30.2))  # +0.67%
    ref = _write(tmp_path, "ref.json", _results())
    assert compare_results.main([ours, ref, "--tol_pct", "1.0"]) == 0
    assert "PARITY: PASS" in capsys.readouterr().out


def test_fail_outside_tolerance(tmp_path, capsys):
    ours = _write(tmp_path, "ours.json", _results(ssim=0.8))  # -11%
    ref = _write(tmp_path, "ref.json", _results())
    assert compare_results.main([ours, ref]) == 1
    out = capsys.readouterr().out
    assert "PARITY: FAIL" in out and "FAIL" in out.splitlines()[1]


def test_missing_metric_fails(tmp_path):
    ours = _results()
    del ours["lpips"]
    assert compare_results.main(
        [_write(tmp_path, "o.json", ours), _write(tmp_path, "r.json", _results())]) == 1


def test_framewise_check(tmp_path):
    ours = _results()
    ours["psnr"]["framewise"][1] = 25.0  # mean untouched, one frame off
    o = _write(tmp_path, "o.json", ours)
    r = _write(tmp_path, "r.json", _results())
    assert compare_results.main([o, r]) == 0
    assert compare_results.main([o, r, "--framewise"]) == 1


def test_honesty_flags_refuse_then_override(tmp_path):
    flagged = _results(decode_quant="int8")
    o = _write(tmp_path, "o.json", flagged)
    r = _write(tmp_path, "r.json", _results())
    assert compare_results.main([o, r]) == 2
    assert compare_results.main([o, r, "--allow_flagged"]) == 0


def test_lpips_fallback_flag_refused(tmp_path):
    ours = _results()
    ours["lpips"]["comparable"] = False
    o = _write(tmp_path, "o.json", ours)
    r = _write(tmp_path, "r.json", _results())
    assert compare_results.main([o, r]) == 2
