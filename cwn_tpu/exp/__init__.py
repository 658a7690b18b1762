"""Experiment harness: CLI parser, single-run pipeline, multi-run wrappers.

Parity: /root/reference/exp/ (parser.py, run_exp.py, run_mol_exp.py,
run_sr_exp.py, run_tu_exp.py, run_ring_exp.py).
"""
