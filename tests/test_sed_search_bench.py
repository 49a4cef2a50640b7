"""sed_search_bench tool: the two timed paths must agree on the optimum."""

import json
import sys

import numpy as np


def test_paths_agree_and_json_line_emitted(capsys):
    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0] + "/tools")
    import sed_search_bench

    sed_search_bench.main(["--clips", "5", "--frames", "101"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["grid_ascent_dispatches"] > 0
    assert rec["sequential_dispatches"] > rec["grid_ascent_dispatches"]
    assert rec["speedup"] is not None
    # the equality asserts inside main() already compared optima


def test_make_inputs_structured():
    import sed_search_bench

    fw, names, gt = sed_search_bench.make_inputs(8, 201, 17, seed=1)
    assert fw.shape == (8, 201, 17) and fw.dtype == np.float32
    assert fw.min() >= 0.0 and fw.max() <= 1.0
    assert len(names) == 8
    assert sum(len(v) for v in gt.values()) >= 8   # ≥1 event per clip
