"""End-to-end discovery-quality experiment (VERDICT r2 item 5).

Proves the Stage-2 machinery *discovers*: on a synthetic SemanticKITTI
fixture whose classes are geometrically separable and whose split-1
held-out classes (other-vehicle, bicyclist) are distinctive
(`data/synthetic.write_learnable_kitti`), run the reference protocol
Stage-1 pretrain -> Stage-2 discovery (`/root/reference/modules/
exp_merge_mean_teacher.py:2332-2393` eval protocol) and record the
per-epoch `valid/mIoU_new` curve. Success = mIoU_new climbs well above
the ~0 it starts at (novel head begins untrained/random).

    JAX_PLATFORMS=cpu python tools/discovery_quality.py \
        --workdir /tmp/dq --stage1-epochs 12 --stage2-epochs 15

Writes <workdir>/result.json {stage1: [...], stage2_miou_new: [...]} and
prints a one-line verdict. Stages are resumable: an existing Stage-1
checkpoint is reused unless --force.
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stage(args_list, log_path, env_extra=None):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.update(env_extra or {})
    with open(log_path, "a") as lf:
        lf.write(f"\n=== {' '.join(args_list)} ===\n")
        lf.flush()
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py")] + args_list,
            stdout=lf, stderr=subprocess.STDOUT, env=env, cwd=REPO,
        )
    if p.returncode != 0:
        raise RuntimeError(
            f"stage failed rc={p.returncode}; see {log_path}")


def read_jsonl(path):
    recs = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    recs.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return recs


def curve(recs, tag):
    pts = sorted(
        ((r["step"], r["value"]) for r in recs if r["tag"] == tag))
    return [round(v, 4) for _, v in pts]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/dq")
    ap.add_argument("--stage1-epochs", type=int, default=12)
    ap.add_argument("--stage2-epochs", type=int, default=15)
    ap.add_argument("--scans-per-seq", type=int, default=24)
    ap.add_argument("--points", type=int, default=4000)
    ap.add_argument("--voxel-size", type=float, default=0.15)
    ap.add_argument("--voxel-cap", type=int, default=4096)
    ap.add_argument("--arch", default="MinkUNet14")
    ap.add_argument("--force", action="store_true")
    a = ap.parse_args()

    os.makedirs(a.workdir, exist_ok=True)
    log = os.path.join(a.workdir, "run.log")
    data_root = os.path.join(a.workdir, "kitti_learn")

    sys.path.insert(0, REPO)
    from gcdlss_tpu.data.synthetic import write_learnable_kitti

    marker = os.path.join(data_root, ".done")
    if a.force or not os.path.exists(marker):
        write_learnable_kitti(
            data_root, sequences=("00", "01"),
            scans_per_seq=a.scans_per_seq, num_points=a.points,
            valid_scans=8,
        )
        open(marker, "w").close()

    common = [
        "-s", "1", "--dataset", "SemanticKITTI", "--dataset_path", data_root,
        "--batch_size", "2", "--num_workers", "0",
        "--downsampling", str(a.points), "--voxel_size", str(a.voxel_size),
        "--voxel_cap", str(a.voxel_cap), "--arch", a.arch,
        "--checkpoint_dir", os.path.join(a.workdir, "ckpt"),
        "--log_dir", os.path.join(a.workdir, "logs"),
        "--split_dir", os.path.join(a.workdir, "split"),
    ]

    s1_dir = os.path.join(a.workdir, "ckpt", "dq_s1")
    if a.force or not os.path.isdir(s1_dir):
        print("[stage1] pretrain ...", flush=True)
        run_stage(common + [
            "--module", "ExpPretrain", "--experiment", "dq_s1",
            "--epochs", str(a.stage1_epochs),
        ], log)
    else:
        print("[stage1] reusing", s1_dir, flush=True)

    print("[stage2] discovery ...", flush=True)
    run_stage(common + [
        "--module", "ExpMergeDiscover_LaserMix_MeanTeacher_NCCAdaptive",
        "--experiment", "dq_s2", "--epochs", str(a.stage2_epochs),
        "--pretrained", s1_dir,
    ], log)

    s1_recs = read_jsonl(
        os.path.join(a.workdir, "logs", "dq_s1", "metrics.jsonl"))
    s2_recs = read_jsonl(
        os.path.join(a.workdir, "logs", "dq_s2", "metrics.jsonl"))
    result = {
        "stage1_loss": curve(s1_recs, "train/loss"),
        "stage1_miou": curve(s1_recs, "valid/mIoU"),
        "stage2_loss": curve(s2_recs, "train/loss"),
        "stage2_miou_old": curve(s2_recs, "valid/mIoU_old"),
        "stage2_miou_new": curve(s2_recs, "valid/mIoU_new"),
        "stage2_n_cand": curve(s2_recs, "train/n_cand"),
    }
    with open(os.path.join(a.workdir, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    new = result["stage2_miou_new"]
    print(json.dumps(result, indent=1))
    if new:
        print(f"VERDICT: mIoU_new {new[0]:.3f} -> {max(new):.3f} "
              f"(final {new[-1]:.3f})", flush=True)


if __name__ == "__main__":
    main()
