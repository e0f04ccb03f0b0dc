"""Repro: (B,S,H)-layout Pallas v2 model co-compiled with the head's
top_k/gather at batch 8.  The identical math in the earlier
(B*NH/G, G, ...) layout does NOT fault (184 img/s), and decode_only=True
plus a separate top-k program does not fault either — the fault needs
this exact full-program combination."""

from _common import run_predict

if __name__ == "__main__":
    run_predict("chunkwise--pallas_xl_chunk_siging_v2", batch=8, decode_only=False)
