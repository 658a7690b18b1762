#!/bin/bash
# Parity config: /root/reference/exp/scripts/cwn-sr.sh (ring lift $1)
python -m cwn_tpu.exp.run_sr \
  --start_seed 0 --stop_seed 4 \
  --model sparse_cin --use_coboundaries True --drop_rate 0.0 \
  --graph_norm id --nonlinearity elu --readout sum --final_readout sum \
  --lr_scheduler None --num_layers 3 --emb_dim 16 --batch_size 8 \
  --task_type isomorphism --eval_metric isomorphism \
  --max_ring_size $1 --init_method sum --preproc_jobs 1 --untrained
