"""Round-3 probe RECORD: band window (tbq/stride) tradeoffs + resident
early-exit, at bench scale (B=32 N=16384 uniform, v5e, 2026-08-17).

Measured (per direction; frac = candidate tile pairs / 2048):
  tbq=512 s=1: band=2.81ms cand=2.53ms frac=0.349 resident_ee=13.95
  tbq=256 s=1: band=2.10   cand=2.14   frac=0.382 resident_ee=13.88
  tbq=256 s=2: band=1.54   cand=2.16   frac=0.365 resident_ee=13.94
  tbq=128 s=2: band=1.20   cand=2.12   frac=0.397 resident_ee=14.47
  tbq=128 s=4: band=0.69   cand=2.17   frac=0.380 resident_ee=14.67
  resident WITHOUT early-exit (plain i-major/j-order): 10.10 ms

Conclusions applied to kernels/nn_sorted.py:
  1. EARLY EXIT LOSES: the (i, ascending-lb) visit order plus a per-pair
     @pl.when(lb <= max(accd[i])) guard cost +3.8 ms over the plain loop
     — guard reads + row max + control flow exceed the skipped-tile
     savings.  Removed; recorded in the kernel docstring.
  2. Band window tbq=256/stride=2 halves band time (2.81 -> 1.54) for
     +1.6% candidates; adopted as the indexed-path default.
All variants produced results bitwise equal to the reference config.
"""
print(__doc__)
