"""Promote a campaign-trained model from data_r2/ (gitignored arrays) into
trained_models/ (git-tracked): copies weights, scalers, args, stats and
metrics JSONs, but NOT the online ensemble snapshot folders. Round 3 lost
every data_r2 model to the machine snapshot — anything worth keeping must
live in trained_models/.

Run:  python scripts/promote_model.py data_r2/eddy/models_Operator1_48/CGANRegression-0 trained_models/eddy_gan_48_op1_s0
"""
import os
import shutil
import sys

KEEP_EXT = {".msgpack", ".json", ".npz"}
SKIP_DIRS = True  # online ensembles live in subfolders — skip them
SKIP_FILES = {"gan_train_ckpt.npz", "vae_train_ckpt.npz",
              "gan_multi_ckpt.npz", "vae_multi_ckpt.npz",
              # full-field offline datasets are hundreds of MB — the
              # scalar scores live in metrics JSONs / VALIDATION tables
              "offline_test.npz", "offline_transfer.npz"}


def promote(src, dst, keep_bank=False):
    os.makedirs(dst, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(src)):
        p = os.path.join(src, name)
        if os.path.isdir(p):
            if keep_bank and name == "epoch_bank":
                shutil.copytree(p, os.path.join(dst, name),
                                dirs_exist_ok=True)
                n += len(os.listdir(p))
            continue
        if name in SKIP_FILES or name.endswith(".meta.json") and \
                "ckpt" in name:
            continue
        if os.path.splitext(name)[1] in KEEP_EXT:
            shutil.copy2(p, os.path.join(dst, name))
            n += 1
    print(f"promoted {n} files: {src} -> {dst}")


if __name__ == "__main__":
    keep_bank = "--keep-bank" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--keep-bank"]
    promote(args[0], args[1], keep_bank=keep_bank)
