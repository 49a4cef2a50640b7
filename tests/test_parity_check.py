"""The parity-on-arrival harness must do the right thing the day the
reference mount is populated — pin its plumbing with a stub reference tree."""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import parity_check  # noqa: E402


def _make_stub_reference(root):
    """A minimal tree that matches SURVEY.md's reconstruction."""
    from sound_event_detection_dcase2017_task4_tpu.config import labels

    os.makedirs(os.path.join(root, "utils"))
    os.makedirs(os.path.join(root, "pytorch"))
    with open(os.path.join(root, "utils", "config.py"), "w") as f:
        f.write(textwrap.dedent(f"""\
            sample_rate = 32000
            window_size = 1024
            hop_size = 320
            mel_bins = 64
            fmin = 50
            fmax = 14000
            labels = {list(labels)!r}
            lb_to_idx = {{lb: i for i, lb in enumerate(labels)}}
            """))
    # a "reference" decode that happens to agree exactly with ours — the
    # harness must then report PASS on identical event lists
    with open(os.path.join(root, "utils", "utilities.py"), "w") as f:
        f.write(textwrap.dedent(f"""\
            import sys
            sys.path.insert(0, {REPO!r})
            from sound_event_detection_dcase2017_task4_tpu import sed

            def create_folder(): pass
            def create_logging(): pass
            class StatisticsContainer: pass
            def write_submission(): pass

            def frame_prediction_to_event_prediction(probs, params):
                return sed.frame_prediction_to_event_prediction(
                    probs, params)
            """))
    with open(os.path.join(root, "pytorch", "models.py"), "w") as f:
        f.write("def init_layer():...\ndef init_bn():...\n"
                "class ConvBlock:...\n")
    # leave the other expected paths missing to exercise DIFF reporting


def test_stub_reference_tree_and_bitcompat(tmp_path):
    ref = str(tmp_path / "reference")
    _make_stub_reference(ref)

    tree = parity_check.stage_tree(ref)
    by_detail = {r["detail"].split(":")[0]: r for r in tree
                 if ":" in r["detail"]}
    assert by_detail["utils/config.py"]["status"] == "OK"
    assert by_detail["pytorch/models.py"]["status"] == "OK"
    assert by_detail["pytorch/main.py"]["status"] == "DIFF"     # missing
    consts = [r for r in tree if r["detail"].startswith("config ")]
    assert consts and all(r["status"] == "OK" for r in consts)
    lbl = [r for r in tree if r["detail"].startswith("labels")]
    assert lbl and lbl[0]["status"] == "OK"

    bit = parity_check.stage_bitcompat(ref)
    decode = [r for r in bit if r["detail"].startswith("decode")]
    assert decode and decode[0]["status"] == "PASS"


def test_dry_mode_cli_exits_zero():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_check.py"),
         "--reference", "/nonexistent-reference"],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dry" in proc.stdout and "PASS" in proc.stdout


def test_dataset_stage_counts(tmp_path):
    meta = tmp_path / "ds" / "metadata"
    meta.mkdir(parents=True)
    lines = "".join(f"clip{i}.wav\t0.0\t1.0\tCar\n" for i in range(488))
    (meta / "groundtruth_strong_label_testing_set.csv").write_text(lines)
    res = parity_check.stage_dataset(str(tmp_path / "ds"))
    testing = [r for r in res if r["detail"].startswith("testing")]
    assert testing and testing[0]["status"] == "OK"


def test_dry_mode_covers_device_decode(tmp_path):
    """Round-3 added the on-device threshold-search decode; the dry
    self-check must pin it against the numpy oracle so the harness stays
    honest as the decode surface evolves (round-2 verdict item 9)."""
    res = parity_check.stage_dry_selfcheck()
    dev = [r for r in res if "binarize_dynamic" in r["detail"]]
    assert dev and dev[0]["status"] == "PASS"
    assert all(r["status"] == "PASS" for r in res)


def test_survey_patch_emitted_on_divergence(tmp_path):
    """When the populated mount diverges from the reconstruction, stage-1
    must produce a ready-to-apply SURVEY.md correction list."""
    ref = str(tmp_path / "reference")
    _make_stub_reference(ref)          # pytorch/main.py is missing → DIFF
    tree = parity_check.stage_tree(ref)
    patch = str(tmp_path / "SURVEY_PATCH.md")
    assert parity_check.write_survey_patch(tree, patch)
    text = open(patch).read()
    assert "pytorch/main.py" in text and "SURVEY.md" in text

    # an exactly-matching tree yields NO patch file
    ok_rows = [r for r in tree if r["status"] != "DIFF"]
    assert not parity_check.write_survey_patch(
        ok_rows, str(tmp_path / "none.md"))
    assert not os.path.isfile(str(tmp_path / "none.md"))


def test_ledger_json_schema():
    """--ledger emits the machine-readable parity-risk work order
    (round-4 verdict item 5): valid JSON, one entry per reconstructed
    choice, each naming its verification stage."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_check.py"),
         "--ledger"], capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    import json
    led = json.loads(proc.stdout)
    assert len(led) >= 10
    for e in led:
        assert set(e) == {"id", "choice", "ours", "risk", "verify",
                          "verify_how"}, e["id"]
        assert e["verify"] in ("tree", "bitcompat", "dataset")
    # the ids the round-3 verdict called out by name are all present
    ids = {e["id"] for e in led}
    assert {"log_top_db", "sed_params_dict", "decode_order",
            "subcommand_spelling", "holdout_fold", "attblock_clamp"} <= ids
    # dry run itemizes the same ledger as SKIP rows
    assert len(parity_check.stage_ledger()) == len(led)
