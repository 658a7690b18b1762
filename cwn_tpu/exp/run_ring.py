"""CLI: python -m cwn_tpu.exp.run_ring (parity: exp/run_ring_exp.py)."""
import sys
from cwn_tpu.exp.wrappers import run_ring_exp

if __name__ == "__main__":
    run_ring_exp(sys.argv[1:])
