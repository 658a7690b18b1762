"""CLI: python -m cwn_tpu.exp.run_tu (parity: exp/run_tu_exp.py)."""
import sys
from cwn_tpu.exp.wrappers import run_tu_exp

if __name__ == "__main__":
    run_tu_exp(sys.argv[1:])
