#!/usr/bin/env python
"""Strip optimizer/scheduler state from a checkpoint, keeping only model
weights (reference ``tools/remove_solver_states.py``).

Usage: python tools/remove_solver_states.py <ckpt_dir_or_last_checkpoint> <out_dir>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    src, dst = sys.argv[1], sys.argv[2]
    import numpy as np
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(src))
    slim = {k: v for k, v in tree.items() if k != "opt_state"}
    ckptr.save(os.path.abspath(dst), slim, force=True)
    print(f"wrote {dst} (dropped opt_state); keys: {sorted(slim)}")


if __name__ == "__main__":
    main()
