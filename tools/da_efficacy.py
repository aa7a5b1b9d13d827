#!/usr/bin/env python
"""End-to-end DA efficacy evidence: does the SCAN machinery actually adapt?

VERDICT r3 #2: parity (losses match torch, mAP A/B equal) proves the
rebuild computes what the reference computes, but not that the
adversarial + GST machinery *works*. This harness builds a synthetic
domain shift and trains the SAME flagship config twice through the real
CLI (tools/train_net_da.py):

  * source-only arm: every discriminator disabled and the GST gate pinned
    shut (SOLVER.INITIAL_AP50=101) — the plain detector + condgraph
    trained on source labels only;
  * DA arm: the shipping CKA (per-level CON discriminators) + GST
    (NODES/ADJ transfer) with the AP50 gate at its config value.

Both arms then evaluate on the corrupted target-domain val split; the
harness asserts the DA arm's AP50 beats source-only by >= --margin and
writes the full comparison to --log (committed as
docs/perf/da_efficacy_r5.log).

Domain construction (mirrors the Cityscapes->Foggy structure of
reference README.md:71): source images are colored rectangles (one color
per class, 8 classes) on textured noise; the target domain is the same
generator under a fog-like corruption — alpha-blend toward a bright gray
veil + Gaussian noise — applied to *different* draws (unpaired domains,
as in the benchmark). Fog strength is the REAL shift: a source-only
model's color features degrade under the veil; alignment on unlabeled
foggy images recovers them.
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLASS_COLORS = np.array([
    (220, 40, 40), (40, 220, 40), (60, 60, 230), (230, 230, 40),
    (230, 40, 230), (40, 230, 230), (240, 140, 40), (140, 90, 40),
], np.float32)  # classes 1..8


def _render_clean(rng, h, w, n_boxes):
    img = rng.uniform(20, 60, (h, w, 3)).astype(np.float32)
    # low-frequency texture so the background is not pure iid noise
    gy = np.linspace(0, 2 * np.pi * rng.uniform(1, 3), h)[:, None]
    gx = np.linspace(0, 2 * np.pi * rng.uniform(1, 3), w)[None, :]
    img += 25 * (np.sin(gy + rng.uniform(0, 6)) * np.cos(gx))[..., None]
    boxes, labels = [], []
    for _ in range(n_boxes):
        bw = int(rng.randint(24, w // 3))
        bh = int(rng.randint(24, h // 3))
        x = int(rng.randint(0, w - bw))
        y = int(rng.randint(0, h - bh))
        c = int(rng.randint(1, 9))
        color = CLASS_COLORS[c - 1] * rng.uniform(0.85, 1.15)
        img[y:y + bh, x:x + bw] = (
            0.85 * color + 0.15 * img[y:y + bh, x:x + bw]
        )
        boxes.append([x, y, bw, bh])
        labels.append(c)
    return np.clip(img, 0, 255), boxes, labels


def _fog(img, rng, alpha=0.65, veil=205.0, noise=10.0):
    out = (1 - alpha) * img + alpha * veil
    out = out + rng.randn(*img.shape).astype(np.float32) * noise
    return np.clip(out, 0, 255)


def _write_split(root, img_dir, ann_path, n, hw, rng, foggy, prefix):
    from PIL import Image

    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.dirname(ann_path), exist_ok=True)
    h, w = hw
    images, annotations = [], []
    ann_id = 1
    for i in range(1, n + 1):
        img, boxes, labels = _render_clean(rng, h, w, int(rng.randint(3, 7)))
        if foggy:
            img = _fog(img, rng)
        fn = f"{prefix}{i}.png"
        Image.fromarray(img.astype(np.uint8)).save(os.path.join(img_dir, fn))
        images.append(dict(id=i, file_name=fn, height=h, width=w))
        for (x, y, bw, bh), c in zip(boxes, labels):
            annotations.append(dict(
                id=ann_id, image_id=i, category_id=c,
                bbox=[x, y, bw, bh], area=bw * bh, iscrowd=0,
            ))
            ann_id += 1
    cats = [dict(id=c, name=f"class{c}") for c in range(1, 9)]
    with open(ann_path, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=cats), f)


def generate(data_root, n_train, n_val, hw, seed):
    d = os.path.join(data_root, "Cityscapes")
    rng = np.random.RandomState(seed)
    _write_split(
        d, os.path.join(d, "leftImg8bit", "train"),
        os.path.join(d, "cocoAnnotations", "cityscapes_train_cocostyle.json"),
        n_train, hw, rng, foggy=False, prefix="src",
    )
    _write_split(
        d, os.path.join(d, "leftImg8bit_foggy", "train"),
        os.path.join(d, "cocoAnnotations",
                     "cityscapes_foggy_train_cocostyle.json"),
        n_train, hw, rng, foggy=True, prefix="tgt",
    )
    _write_split(
        d, os.path.join(d, "leftImg8bit_foggy", "val"),
        os.path.join(d, "cocoAnnotations",
                     "cityscapes_foggy_val_cocostyle.json"),
        n_val, hw, rng, foggy=True, prefix="val",
    )


COMMON_OPTS = [
    "INPUT.MIN_SIZE_RANGE_TRAIN", "(-1,-1)",
    "INPUT.MIN_SIZE_TRAIN", "(320,)",
    "INPUT.MAX_SIZE_TRAIN", "448",
    "INPUT.MIN_SIZE_TEST", "320",
    "INPUT.MAX_SIZE_TEST", "448",
    "SOLVER.IMS_PER_BATCH", "4",
    "TEST.IMS_PER_BATCH", "4",
    "SOLVER.VAL_ITER", "250",
    "TPU.MAX_NODES", "128",
    "TPU.MAX_TARGET_POINTS", "128",
    "TPU.MAX_BOXES", "16",
    "TPU.LOADER_THREADS", "2",
    "TPU.COMPUTE_DTYPE", "float32",
]

SOURCE_ONLY_OPTS = [
    # no adversarial alignment, GST gate pinned shut
    "MODEL.ADV.USE_DIS_CON", "False",
    "MODEL.ADV.USE_DIS_P3_CON", "False",
    "MODEL.ADV.USE_DIS_P4_CON", "False",
    "MODEL.ADV.USE_DIS_P5_CON", "False",
    "MODEL.ADV.USE_DIS_P6_CON", "False",
    "MODEL.ADV.USE_DIS_P7_CON", "False",
    "SOLVER.INITIAL_AP50", "101.0",
]


def lr_decay_opts(max_iter):
    """Scale the C2F recipe's LR-decay structure into the run budget.

    The reference schedule decays at (60k, 73k) of 80k iters (its yaml
    SOLVER.*.STEPS); the round-4 run held LR constant for its whole 3.5k
    budget, so both arms oscillated +/-80% and the final-weights
    comparison was a noisy single point (VERDICT r4 #8). Decaying at the
    same (75%, 91%) fractions settles both arms before the last
    validations."""
    steps = f"({int(max_iter * 0.75)},{int(max_iter * 0.91)})"
    opts = []
    for module in ("BACKBONE", "MIDDLE_HEAD", "FCOS", "DIS"):
        opts += [f"SOLVER.{module}.STEPS", steps]
    return opts


VAL_RE = None  # compiled lazily in parse_validations


def parse_validations(text):
    """All in-training 'validation @it: AP50=x' readings (percent)."""
    import re

    global VAL_RE
    if VAL_RE is None:
        VAL_RE = re.compile(r"validation @(\d+): \S+?=([0-9.eE+-]+)")
    return [(int(m.group(1)), float(m.group(2)))
            for m in VAL_RE.finditer(text)]


def run_arm(name, data_root, out_dir, max_iter, extra_opts, log_lines):
    import shutil

    # fresh output dir: the checkpointer auto-resumes from last_checkpoint
    # (by design), which silently turns a re-run into a resume of stale
    # weights — each arm must start from initialisation
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg_path = os.path.join(
        REPO, "configs", "scan", "scan_vgg16_cityscapace_to_foggy.yaml"
    )
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "train_net_da.py"),
        "--config-file", cfg_path,
        *COMMON_OPTS, *lr_decay_opts(max_iter), *extra_opts,
        "SOLVER.MAX_ITER", str(max_iter),
        "OUTPUT_DIR", out_dir,
    ]
    env = dict(os.environ, SCAN_TPU_DATA_DIR=data_root)
    log_lines.append(f"== arm {name}: {' '.join(cmd[2:])}")
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    tail = "\n".join(proc.stdout.splitlines()[-20:] +
                     proc.stderr.splitlines()[-20:])
    log_lines.append(tail)
    if proc.returncode != 0:
        raise RuntimeError(f"arm {name} failed rc={proc.returncode}:\n{tail}")
    # last-5 in-training validations: mean +/- spread beats a single
    # endpoint under schedule noise (VERDICT r4 #8)
    vals = parse_validations(proc.stdout + proc.stderr)
    last5 = [v for _, v in vals[-5:]]
    if last5:
        mean5 = float(np.mean(last5))
        spread5 = float(max(last5) - min(last5))
        log_lines.append(
            f"arm {name}: last-5 validations (percent) "
            f"{[round(v, 2) for v in last5]} -> mean {mean5:.2f} "
            f"+/- spread {spread5:.2f}"
        )
    else:
        mean5 = spread5 = float("nan")
        log_lines.append(f"arm {name}: no in-training validations parsed")
    # final eval on the target val split
    eval_cmd = [
        sys.executable, os.path.join(REPO, "tools", "train_net_da.py"),
        "--config-file", cfg_path, "--test-only",
        *COMMON_OPTS, *extra_opts,
        "SOLVER.MAX_ITER", str(max_iter),
        "OUTPUT_DIR", out_dir,
    ]
    proc = subprocess.run(eval_cmd, env=env, capture_output=True, text=True)
    out = proc.stdout + proc.stderr
    ap50 = None
    for line in out.splitlines():
        if "test results" in line:
            log_lines.append(line.strip())
            # e.g. "... test results: {'AP': 0.12, 'AP50': 0.33, ...}"
            import re

            m = re.search(r"'AP50':\s*([0-9.eE+-]+)", line)
            if m:
                ap50 = float(m.group(1))
    if ap50 is None:
        raise RuntimeError(f"arm {name}: AP50 not found in eval output:\n"
                           + "\n".join(out.splitlines()[-30:]))
    log_lines.append(f"arm {name}: target-val AP50 = {ap50:.4f}")
    return ap50, mean5, spread5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/tmp/da_efficacy_ds")
    ap.add_argument("--out-root", default="/tmp/da_efficacy_out")
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-val", type=int, default=32)
    ap.add_argument("--hw", default="320,416")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--margin", type=float, default=0.02,
                    help="required AP50 gain (fraction) of DA over "
                         "source-only")
    ap.add_argument("--log", default=os.path.join(
        REPO, "docs", "perf", "da_efficacy_r5.log"))
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    hw = tuple(int(x) for x in args.hw.split(","))
    if not args.skip_gen:
        generate(args.data_root, args.n_train, args.n_val, hw, args.seed)
        print("dataset generated at", args.data_root)

    log_lines = [
        "DA efficacy run (synthetic clean->fog shift; see "
        "tools/da_efficacy.py)",
        f"iters={args.iters} n_train={args.n_train} n_val={args.n_val} "
        f"hw={hw} seed={args.seed}",
    ]
    ap50_src, m5_src, sp_src = run_arm(
        "source-only", args.data_root,
        os.path.join(args.out_root, "source_only"),
        args.iters, SOURCE_ONLY_OPTS, log_lines,
    )
    ap50_da, m5_da, sp_da = run_arm(
        "da-full", args.data_root,
        os.path.join(args.out_root, "da_full"),
        args.iters, ["SOLVER.INITIAL_AP50", "2.0"], log_lines,
    )
    gain = ap50_da - ap50_src
    verdict = "PASS" if gain >= args.margin else "FAIL"
    log_lines.append(
        f"RESULT: source-only AP50={ap50_src:.4f}  DA AP50={ap50_da:.4f}  "
        f"gain={gain:+.4f}  margin={args.margin}  {verdict}"
    )
    log_lines.append(
        f"RESULT last-5 validations (percent): source-only "
        f"{m5_src:.2f} +/- {sp_src:.2f}  DA {m5_da:.2f} +/- {sp_da:.2f}  "
        f"gap {m5_da - m5_src:+.2f}"
    )
    os.makedirs(os.path.dirname(args.log), exist_ok=True)
    with open(args.log, "w") as f:
        f.write("\n".join(log_lines) + "\n")
    print("\n".join(log_lines[-4:]))
    if verdict != "PASS":
        sys.exit(1)


if __name__ == "__main__":
    main()
