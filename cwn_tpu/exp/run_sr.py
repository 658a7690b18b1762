"""CLI: python -m cwn_tpu.exp.run_sr (parity: exp/run_sr_exp.py)."""
import sys
from cwn_tpu.exp.wrappers import run_sr_exp

if __name__ == "__main__":
    run_sr_exp(sys.argv[1:])
