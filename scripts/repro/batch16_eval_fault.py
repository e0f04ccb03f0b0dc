"""Repro: the default XLA-scan eval program at batch 16 (batch 8 is fine)."""

from _common import run_predict

if __name__ == "__main__":
    run_predict("chunkwise--native_autograd", batch=16)
