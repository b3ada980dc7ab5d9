"""bench.py's supervisor must survive transient TPU-worker crashes: retry
failed attempts in fresh subprocesses and ALWAYS print a parseable JSON line
(VERDICT round 1: BENCH_r01.json recorded rc=1 with no output because the
axon worker crashed at the first device sync)."""
import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_supervised(tmp_path, capsys, inner_body):
    bench = load_bench()
    stub = tmp_path / "stub_bench.py"
    stub.write_text(inner_body)
    rc = bench.supervise([], script=str(stub), backoff_s=0)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, out


class TestBenchSupervisor:
    def test_success_passthrough(self, tmp_path, capsys):
        rc, out = run_supervised(tmp_path, capsys, (
            "import json\n"
            "print(json.dumps({'metric': 'm', 'value': 1.0,"
            " 'unit': 'u', 'vs_baseline': 1.0}))\n"))
        assert rc == 0
        parsed = json.loads(out[-1])
        assert parsed["value"] == 1.0 and "error" not in parsed

    def test_retry_then_success(self, tmp_path, capsys):
        marker = tmp_path / "crashed_once"
        rc, out = run_supervised(tmp_path, capsys, (
            "import json, os, sys\n"
            f"marker = {str(marker)!r}\n"
            "if not os.path.exists(marker):\n"
            "    open(marker, 'w').close()\n"
            "    sys.exit(1)  # simulated FAILED_PRECONDITION crash\n"
            "print(json.dumps({'metric': 'm', 'value': 2.0,"
            " 'unit': 'u', 'vs_baseline': 2.0}))\n"))
        assert rc == 0
        assert json.loads(out[-1])["value"] == 2.0

    def test_all_attempts_dead_still_prints_json(self, tmp_path, capsys):
        rc, out = run_supervised(tmp_path, capsys,
                                 "import sys\nsys.exit(1)\n")
        assert rc == 0
        parsed = json.loads(out[-1])
        assert "error" in parsed and parsed["value"] == 0
