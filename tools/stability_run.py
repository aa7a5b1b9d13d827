"""Sustained DA-training stability run with a mid-run kill/resume.

Drives the real CLI (``tools/train_net_da.py``) on the flagship C2F
schedule over a synthetic Cityscapes-shaped dataset, SIGKILLs the
process mid-run, relaunches it (auto-resume from the last checkpoint,
reference ``fcos_core/engine/trainer.py:146`` via the checkpointer's
``last_checkpoint`` pointer), and then asserts over the combined log:

  * every loss term stays finite (no NaN/Inf) for the whole schedule;
  * total loss decreases (first-window mean > last-window mean);
  * in-loop validation fired and a best-AP50 checkpoint was written;
  * the resumed process restored the killed run's iteration;

Usage (takes ~30 min on one v5e + 1-core host):
    python tools/stability_run.py --iters 2000 --kill-frac 0.5 \
        --out /tmp/stab --data /tmp/stab_ds
The combined, trimmed log is written to ``--log-out`` (committed as
docs/perf/stability_r5.log); its first line carries the PASS/FAIL
verdict and any failure reasons.
"""

import argparse
import json
import math
import os
import re
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_synth_cityscapes(root, n_train=32, n_val=8, hw=(512, 1024),
                          n_cats=8, seed=0):
    """COCO-style tree matching the catalog paths for the C2F config."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    h, w = hw

    def split(img_dir, ann_file, n, cam_seed):
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(os.path.dirname(ann_file), exist_ok=True)
        r = np.random.RandomState(cam_seed)
        images, annotations = [], []
        ann_id = 1
        for i in range(1, n + 1):
            # structured image: blocks + noise so the loss has signal
            arr = (r.randint(0, 80, (h, w, 3)) +
                   r.randint(0, 40)).astype(np.uint8)
            for b in range(3):
                x, y = int(r.randint(0, w - 64)), int(r.randint(0, h - 48))
                bw, bh = int(r.randint(48, 160)), int(r.randint(32, 120))
                bw, bh = min(bw, w - x), min(bh, h - y)
                cat = int(r.randint(1, n_cats + 1))
                arr[y:y + bh, x:x + bw] = (
                    np.array([30 * cat, 255 - 25 * cat, 60 + 20 * cat])
                    + r.randint(-10, 10, (bh, bw, 3))
                ).clip(0, 255).astype(np.uint8)
                annotations.append(dict(
                    id=ann_id, image_id=i, category_id=cat,
                    bbox=[x, y, bw, bh], area=bw * bh, iscrowd=0))
                ann_id += 1
            name = f"img{i:04d}.png"
            Image.fromarray(arr).save(os.path.join(img_dir, name))
            images.append(dict(id=i, file_name=name, height=h, width=w))
        cats = [dict(id=c, name=f"cat{c}") for c in range(1, n_cats + 1)]
        with open(ann_file, "w") as f:
            json.dump(dict(images=images, annotations=annotations,
                           categories=cats), f)

    cs = os.path.join(root, "Cityscapes")
    ann = os.path.join(cs, "cocoAnnotations")
    split(os.path.join(cs, "leftImg8bit", "train"),
          os.path.join(ann, "cityscapes_train_cocostyle.json"),
          n_train, seed + 1)
    split(os.path.join(cs, "leftImg8bit_foggy", "train"),
          os.path.join(ann, "cityscapes_foggy_train_cocostyle.json"),
          n_train, seed + 2)
    split(os.path.join(cs, "leftImg8bit_foggy", "val"),
          os.path.join(ann, "cityscapes_foggy_val_cocostyle.json"),
          n_val, seed + 3)
    return root


def launch(args, out_dir, data_dir, max_iter, val_iter, ckpt_period,
           log_path):
    env = dict(os.environ, SCAN_TPU_DATA_DIR=data_dir)
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "train_net_da.py"),
        "--config-file",
        os.path.join(REPO, "configs/scan/scan_vgg16_cityscapace_to_foggy.yaml"),
        "MODEL.WEIGHT", "",
        "SOLVER.MAX_ITER", str(max_iter),
        "SOLVER.VAL_ITER", str(val_iter),
        "SOLVER.CHECKPOINT_PERIOD", str(ckpt_period),
        "SOLVER.INITIAL_AP50", "0",
        "TEST.IMS_PER_BATCH", "4",
        "TPU.LOADER_THREADS", "2",
        "OUTPUT_DIR", out_dir,
    ] + (args.overrides or [])
    logf = open(log_path, "ab")
    return subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT,
                            env=env, cwd=REPO)


ITER_RE = re.compile(r"iter: (\d+)\s")


def last_iter(log_path):
    try:
        with open(log_path, "rb") as f:
            tail = f.read()[-20000:].decode("utf-8", "replace")
    except OSError:
        return 0
    hits = ITER_RE.findall(tail)
    return int(hits[-1]) if hits else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--kill-frac", type=float, default=0.5)
    ap.add_argument("--val-iter", type=int, default=250)
    ap.add_argument("--ckpt-period", type=int, default=250)
    ap.add_argument("--out", default="/tmp/stab_out")
    ap.add_argument("--data", default="/tmp/stab_ds")
    ap.add_argument("--log-out", default="/tmp/stability_run.log")
    ap.add_argument("--timeout", type=float, default=7200)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    marker = os.path.join(args.data, "Cityscapes", "cocoAnnotations",
                          "cityscapes_foggy_val_cocostyle.json")
    if not os.path.exists(marker):
        print("generating synthetic dataset ...", flush=True)
        make_synth_cityscapes(args.data)

    os.makedirs(args.out, exist_ok=True)
    log_path = os.path.join(args.out, "run.log")
    open(log_path, "wb").close()
    kill_at = max(1, int(args.iters * args.kill_frac))

    # ---- phase A: run until kill_at, then SIGKILL (no cleanup) ----
    print(f"phase A: training to iter {kill_at}, then SIGKILL", flush=True)
    t0 = time.time()
    proc = launch(args, args.out, args.data, args.iters, args.val_iter,
                  args.ckpt_period, log_path)
    killed_at = None
    while proc.poll() is None:
        if time.time() - t0 > args.timeout:
            proc.kill()
            raise SystemExit("phase A timed out")
        it = last_iter(log_path)
        if it >= kill_at:
            killed_at = it
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            break
        time.sleep(5)
    if killed_at is None:
        raise SystemExit(
            f"phase A exited rc={proc.returncode} before iter {kill_at}"
        )
    print(f"killed at iter ~{killed_at} "
          f"({time.time() - t0:.0f}s)", flush=True)

    # ---- phase B: relaunch; must auto-resume and finish ----
    with open(log_path, "ab") as f:
        f.write(b"\n===== SIGKILL + RELAUNCH =====\n")
    proc = launch(args, args.out, args.data, args.iters, args.val_iter,
                  args.ckpt_period, log_path)
    rc = proc.wait(timeout=args.timeout)
    wall = time.time() - t0
    if rc != 0:
        raise SystemExit(f"phase B failed rc={rc}; see {log_path}")

    # ---- assertions over the combined log ----
    text = open(log_path, "rb").read().decode("utf-8", "replace")
    failures = []

    restored = re.findall(r"restored .* at iteration (\d+)", text)
    if not restored:
        failures.append("no 'restored ... at iteration' line after relaunch")
    else:
        r = int(restored[-1])
        if not (0 < r <= killed_at):
            failures.append(f"resume restored iteration {r}, "
                            f"killed at ~{killed_at}")

    # loss trajectory: 'loss_total: <median> (<global_avg>)' per window.
    # Check BOTH columns: the round-4 collapse was hidden because the old
    # median silently skipped NaNs while only the global_avg went nan
    # (the harness used to parse just the median).
    losses = [(int(m.group(1)), float(m.group(2)), float(m.group(3)))
              for m in re.finditer(
        r"iter: (\d+).*?loss_total: ([0-9.eE+-]+|nan|inf)"
        r" \(([0-9.eE+-]+|nan|inf)\)", text)]
    head = tail = float("nan")
    if len(losses) < 10:
        failures.append(f"only {len(losses)} loss readings found")
    else:
        vals = np.array([v for _, v, _ in losses], np.float64)
        gavg = np.array([g for _, _, g in losses], np.float64)
        if not (np.all(np.isfinite(vals)) and np.all(np.isfinite(gavg))):
            bad_i = np.where(~(np.isfinite(vals) & np.isfinite(gavg)))[0]
            bad = [losses[i] for i in bad_i]
            failures.append(f"non-finite loss at iters {bad[:5]}")
        head = float(np.median(vals[: max(3, len(vals) // 5)]))
        tail = float(np.median(vals[-max(3, len(vals) // 5):]))
        if not tail < head:
            failures.append(f"loss did not decrease: head={head:.3f} "
                            f"tail={tail:.3f}")
    final = [it for it, _, _ in losses]
    if not final or final[-1] < args.iters:
        failures.append(f"final logged iter {final[-1] if final else 0} "
                        f"< {args.iters}")

    vals = re.findall(r"validation @(\d+): (\S+)=([0-9.eE+-]+)", text)
    if len(vals) < 2:
        failures.append(f"in-loop validation fired {len(vals)} times")
    else:
        # collapse detector: a NaN-poisoned model scores 0.0; require the
        # final validation to hold a reasonable fraction of the best.
        series = [float(v) for _, _, v in vals]
        if series[-1] <= 0.0 or series[-1] < 0.25 * max(series):
            failures.append(
                f"final validation {series[-1]:.3f} collapsed vs best "
                f"{max(series):.3f}")
    best = re.findall(r"model_([0-9.]+)_(\d+)", text)
    if not best:
        failures.append("no best-AP50 checkpoint (model_{ap:.4f}_{it}) saved")

    # Trimmed log for committing — written AFTER the assertions so the
    # header carries the verdict. A failing run's log is stamped FAIL on
    # its very first line (plus the failure list) and can never again be
    # mistaken for passing evidence (round-4 lesson: the harness used to
    # write the log before evaluating failures).
    keep = [ln for ln in text.splitlines() if re.search(
        r"iter: \d+|validation @|restored|saved checkpoint|RELAUNCH|"
        r"Start DA training|devices|environment", ln)]
    verdict = "FAIL" if failures else "PASS"
    hdr = (f"# STABILITY RUN {verdict}\n"
           f"# {args.iters} iters C2F DA schedule, "
           f"SIGKILL @~{killed_at}, resumed, wall {wall:.0f}s\n"
           f"# validations: {len(vals)}  best-ckpts: {len(best)}  "
           f"loss head->tail: {head:.3f}->{tail:.3f}\n")
    if failures:
        hdr += "".join(f"# FAILURE: {f}\n" for f in failures)
    with open(args.log_out, "w") as f:
        f.write(hdr + "\n".join(keep) + "\n")

    print(hdr, flush=True)
    if failures:
        print("FAILURES:\n  " + "\n  ".join(failures))
        raise SystemExit(1)
    print(f"STABILITY RUN OK ({wall:.0f}s); trimmed log -> {args.log_out}")


if __name__ == "__main__":
    main()
