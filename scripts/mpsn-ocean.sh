#!/bin/bash
# Parity config: /root/reference/exp/scripts/mpsn-ocean.sh (nonlinearity $1: id|tanh)
python -m cwn_tpu.exp.run_mol \
  --stop_seed 4 --epochs 250 --dataset OCEAN --model edge_orient \
  --num_layers 4 --emb_dim 64 --lr 0.001 --batch_size 64 \
  --preproc_jobs 2 --test_orient random --nonlinearity "$1" \
  --drop_rate 0.0 --lr_scheduler_decay_steps 50 \
  --task_type classification --eval_metric accuracy \
  --exp_name ocean_mpsn --dump_curves
