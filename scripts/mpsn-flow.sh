#!/bin/bash
# Parity config: /root/reference/exp/scripts/mpsn-flow.sh
python -m cwn_tpu.exp.run_exp \
  --dataset FLOW --model edge_orient --nonlinearity id \
  --num_layers 4 --emb_dim 64 --batch_size 64 --lr 0.001 \
  --epochs 100 --task_type classification --eval_metric accuracy \
  --lr_scheduler StepLR --lr_scheduler_decay_steps 20
