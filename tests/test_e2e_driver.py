"""End-to-end driver tests: real CLI entry points on a synthetic dataset.

Runs `tools_dev/make_synth_data.py` output through the actual
`macsa_tpu.train.finetune` / `pretrain` mains (tiny text config from the
synthetic tokenizer dir, 1-block ResNet via --resnet_stages) and checks the
artifact contract: decreasing loss, full epochs (regression for the
silently-truncated-epoch loader bug), best/last checkpoints, test report
files, and the Phase-1 -> Phase-2 encoder transfer.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools_dev", "make_synth_data.py"),
         str(out), "8"],
        check=True, capture_output=True, text=True)
    return out


# batch 8: the conftest CPU mesh has 8 dp devices and the global batch must
# divide evenly across them
COMMON = ["--num_imgs", "2", "--num_rois", "2", "--train_batch_size", "8",
          "--eval_batch_size", "8", "--log_every", "1",
          "--resnet_stages", "1,1,1,1"]

# Fixed-seed goldens live in tests/goldens/e2e_losses.json, keyed by the
# recording host's fingerprint; foreign hosts get a sanity band + self-
# recorded run-to-run determinism instead of cross-machine value pinning
# (tests/golden_utils.py has the full r5 policy; re-record via
# tools_dev/record_e2e_goldens.sh when the math changes intentionally).
from golden_utils import check_golden  # noqa: E402


@pytest.mark.slow
def test_finetune_driver_end_to_end(synth):
    from macsa_tpu.train.finetune import main
    out_dir = str(synth / "out_ft")
    result = main([
        "--data_dir", str(synth / "data"), "--image_dir", str(synth / "images"),
        "--output_dir", out_dir, "--pretrained_hf_model", str(synth / "tok"),
        "--num_train_epochs", "2", "--do_train", "--do_eval", "--do_test",
        *COMMON])
    assert "best_dev_f1" in result and "test" in result
    assert 0.0 <= result["test"]["average"]["f1"] <= 1.0
    for name in ("best", "last", "train.log", "metrics.jsonl",
                 "test_results_fcmf.txt", "test_predictions_formatted.txt"):
        assert os.path.exists(os.path.join(out_dir, name)), name

    # full epochs: 8 train samples / batch 8 -> 1 step per epoch, 2 epochs
    # (regression: a swallowed loader exception used to truncate epochs)
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    train_recs = [r for r in recs if "loss" in r]
    assert len(train_recs) == 2, train_recs

    # Fixed-seed loss goldens (VERDICT r3 item 7): the full driver path —
    # synth data gen, tokenization, packed pixel transfer, init, dp8 train
    # steps — checked against tests/goldens/e2e_losses.json.  A silent
    # numeric regression (init, masking, normalization, loss) fails here
    # instead of surfacing as an invisible F1 drift.  Exact values are
    # deterministic per host but not portable across CPU families
    # (VERDICT r4), so foreign hosts assert a sanity band plus their own
    # recorded values — see tests/golden_utils.py.
    check_golden("finetune_losses", [r["loss"] for r in train_recs])

    with open(os.path.join(out_dir, "test_results_fcmf.txt")) as f:
        report = f.read()
    assert "Average:" in report and "Location:" in report


@pytest.mark.slow
def test_finetune_pixel_transfer_parity(synth):
    """The packed-uint32 transfer (drivers' default) trains identically to
    the reference-shaped f32 transfer: same per-step losses to float
    rounding (ops/image_prep.py: same normalize formula, ~1 ulp FMA slack;
    empty slots exact zeros via the frame validity word)."""
    from macsa_tpu.train.finetune import main

    def losses(transfer):
        out_dir = str(synth / f"out_transfer_{transfer}")
        main(["--data_dir", str(synth / "data"),
              "--image_dir", str(synth / "images"),
              "--output_dir", out_dir,
              "--pretrained_hf_model", str(synth / "tok"),
              "--pixel_transfer", transfer,
              "--num_train_epochs", "2", "--do_train", *COMMON])
        with open(os.path.join(out_dir, "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        return [r["loss"] for r in recs if "loss" in r]

    packed, f32 = losses("packed"), losses("f32")
    assert len(packed) == len(f32) == 2
    for a, b in zip(packed, f32):
        assert abs(a - b) < 2e-3, (packed, f32)


@pytest.mark.slow
def test_pretrain_then_transfer(synth):
    from macsa_tpu.train.pretrain import main as pretrain_main
    from macsa_tpu.train.finetune import main as finetune_main

    iaog_dir = str(synth / "out_iaog")
    result = pretrain_main([
        "--pretrained_data_dir", str(synth / "data"),
        "--image_dir", str(synth / "images"),
        "--output_dir", iaog_dir, "--pretrained_hf_model", str(synth / "tok"),
        "--num_train_epochs", "1", "--debug_decode_every", "0", "--do_train",
        *COMMON])
    assert result["best_train_loss"] < float("inf")
    assert os.path.exists(os.path.join(iaog_dir, "best"))
    # fixed-seed golden for the Phase-1 seq2seq step (see the finetune
    # golden above for scope/update policy)
    check_golden("pretrain_best_train_loss", result["best_train_loss"])

    out_dir = str(synth / "out_ft_transfer")
    finetune_main([
        "--data_dir", str(synth / "data"), "--image_dir", str(synth / "images"),
        "--output_dir", out_dir, "--pretrained_hf_model", str(synth / "tok"),
        "--pretrained_iaog_path", iaog_dir,
        "--num_train_epochs", "1", "--do_train", *COMMON])
    with open(os.path.join(out_dir, "train.log")) as f:
        log = f.read()
    assert "Transferring IAOG encoder" in log


@pytest.mark.slow
def test_cross_stage_disk_feature_cache(synth):
    """Stage 2 (finetune) reuses stage 1's (pretrain) on-disk frozen-CNN
    features: the finetune run prefill-loads every row from the shared
    cache dir instead of re-decoding, and its losses match a run without
    the disk cache exactly (the cached features are bit-identical)."""
    from macsa_tpu.train.finetune import main as finetune_main
    from macsa_tpu.train.pretrain import main as pretrain_main

    cache_dir = str(synth / "feat_cache")
    pretrain_main([
        "--pretrained_data_dir", str(synth / "data"),
        "--image_dir", str(synth / "images"),
        "--output_dir", str(synth / "out_iaog_dc"),
        "--pretrained_hf_model", str(synth / "tok"),
        "--feature_cache_dir", cache_dir,
        "--num_train_epochs", "1", "--debug_decode_every", "0", "--do_train",
        *COMMON])
    import os as _os
    n_entries = len([f for f in _os.listdir(cache_dir)
                     if f.endswith(".grid.npy")])
    assert n_entries > 0, "pretrain wrote no disk cache entries"

    def ft_losses(out_name, extra):
        out_dir = str(synth / out_name)
        finetune_main([
            "--data_dir", str(synth / "data"),
            "--image_dir", str(synth / "images"),
            "--output_dir", out_dir,
            "--pretrained_hf_model", str(synth / "tok"),
            "--num_train_epochs", "1", "--do_train", *extra, *COMMON])
        with open(os.path.join(out_dir, "metrics.jsonl")) as f:
            losses = [json.loads(l)["loss"] for l in f
                      if "loss" in json.loads(l)]
        with open(os.path.join(out_dir, "train.log")) as f:
            return losses, f.read()

    hot, hot_log = ft_losses("out_ft_dc",
                             ["--feature_cache_dir", cache_dir])
    # stage 2 read stage 1's extraction.  Not necessarily 8/8: a review
    # whose only IAOG sample fell in stage 1's drop_last tail was never
    # extracted there — the cold path covers it.
    import re
    m = re.search(r"prefilled (\d+)/8 rows from disk", hot_log)
    assert m and int(m.group(1)) >= 6, hot_log[-2000:]
    cold, _ = ft_losses("out_ft_nodc", [])
    assert hot == cold, (hot, cold)  # cached features are exact


@pytest.mark.slow
def test_inference_cli_end_to_end(synth):
    """Single-sample inference on the checkpoint trained above (runs after
    test_finetune_driver_end_to_end in file order)."""
    from macsa_tpu.config import ASPECTS, POLARITIES
    from macsa_tpu.inference.cli import main

    ckpt = synth / "out_ft" / "best"
    assert ckpt.exists(), "finetune e2e test must run first"
    out_file = str(synth / "inference_out.json")
    result = main([
        "--checkpoint", str(ckpt),
        "--pretrained_hf_model", str(synth / "tok"),
        "--roi_csv", str(synth / "data" / "roi_data.csv"),
        "--num_imgs", "2", "--num_rois", "2",
        "--resnet_stages", "1,1,1,1",
        "--text", "khách sạn rất đẹp phòng sạch sẽ",
        "--image_list", str(synth / "images" / "img_000.png"),
        "--output_file", out_file])
    assert set(result) == set(ASPECTS)
    assert all(p in POLARITIES for p in result.values())
    with open(out_file) as f:
        dumped = json.load(f)
    assert dumped["prediction"] == result and "normalized" in dumped


@pytest.mark.slow
def test_inference_cli_bundle_mode(synth):
    """AOT bundle serving: export the finetuned checkpoint to StableHLO,
    run the CLI with --bundle, and check it matches --checkpoint mode."""
    from macsa_tpu.inference.cli import main
    from macsa_tpu.inference.export import export_bundle

    ckpt = synth / "out_ft" / "best"
    assert ckpt.exists(), "finetune e2e test must run first"
    bundle_dir = str(synth / "bundle")
    export_bundle(checkpoint=str(ckpt), output_dir=bundle_dir, batch_size=2,
                  pretrained_hf_model=str(synth / "tok"),
                  resnet_stages=(1, 1, 1, 1), num_imgs=2, num_rois=2,
                  platforms=("cpu",))
    common = ["--pretrained_hf_model", str(synth / "tok"),
              "--roi_csv", str(synth / "data" / "roi_data.csv"),
              "--text", "khách sạn rất đẹp phòng sạch sẽ",
              "--image_list", str(synth / "images" / "img_000.png")]
    got = main(["--bundle", bundle_dir, *common])
    want = main(["--checkpoint", str(ckpt), "--num_imgs", "2",
                 "--num_rois", "2", "--resnet_stages", "1,1,1,1", *common])
    assert got == want


@pytest.mark.slow
def test_inference_cli_batch_mode(synth):
    """--input_json batch serving: 3 records through one compiled forward
    (batch 2 + padded last chunk), JSONL output."""
    from macsa_tpu.config import ASPECTS, POLARITIES
    from macsa_tpu.inference.cli import main

    ckpt = synth / "out_ft" / "best"
    assert ckpt.exists(), "finetune e2e test must run first"
    records = [
        {"text": "khách sạn rất đẹp",
         "image_list": [str(synth / "images" / "img_000.png")]},
        {"text": "phòng bẩn quá"},
        {"text": "đồ ăn ngon"},
    ]
    in_file = str(synth / "batch_in.json")
    out_file = str(synth / "batch_out.jsonl")
    with open(in_file, "w") as f:
        json.dump(records, f, ensure_ascii=False)
    summary = main([
        "--checkpoint", str(ckpt),
        "--pretrained_hf_model", str(synth / "tok"),
        "--roi_csv", str(synth / "data" / "roi_data.csv"),
        "--num_imgs", "2", "--num_rois", "2", "--batch_size", "2",
        "--resnet_stages", "1,1,1,1",
        "--input_json", in_file, "--output_file", out_file])
    assert summary["records"] == 3 and summary["batch_size"] == 2
    with open(out_file) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 3
    for rec, line in zip(records, lines):
        assert line["text"] == rec["text"]
        assert set(line["prediction"]) == set(ASPECTS)
        assert all(p in POLARITIES for p in line["prediction"].values())
