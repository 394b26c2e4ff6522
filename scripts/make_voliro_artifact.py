"""Produce the committed Voliro reproduction artifact.

Runs the run_voliro driver VERBATIM (full reference hyperparameters,
2000 epochs) against synthetic PX4-style flight logs (the real Voliro
logs are not distributable; the synthetic logs exercise every loader
path and the full physics+GP training stack). Artifacts land in
artifacts/voliro/.

Usage (real TPU, one JAX process at a time):
    python scripts/make_voliro_artifact.py [epochs]
"""

import os
import shutil
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from test_voliro_dataset import make_log

    data_dir = tempfile.mkdtemp() + "/"
    make_log(data_dir + "voliro_tilt.mat", n=4000, seed=1)
    make_log(data_dir + "voliro_flip.mat", n=20500, seed=2)

    from scripts.driver_util import load_driver

    mod = load_driver("run_voliro.py")

    out = os.path.join(HERE, "run_output", "voliro_artifact")
    mod.main(root=out, epochs=epochs, data_dir=data_dir)

    art = os.path.join(HERE, "artifacts", "voliro")
    os.makedirs(art, exist_ok=True)
    for f in ["voliro_forces.pdf", "training_loss.pdf", "var_dump.txt", "metrics.jsonl"]:
        src = os.path.join(out, f)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(art, f))
            print("committed artifact:", f)


if __name__ == "__main__":
    main()
