"""CLI: python -m cwn_tpu.exp.run_mol (parity: exp/run_mol_exp.py)."""
import sys
from cwn_tpu.exp.wrappers import run_mol_exp

if __name__ == "__main__":
    run_mol_exp(sys.argv[1:])
