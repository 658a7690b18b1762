#!/bin/bash
# Parity config: /root/reference/exp/scripts/cwn-molhiv-small.sh
python -m cwn_tpu.exp.run_mol \
  --start_seed 0 --stop_seed 9 --exp_name cwn-molhiv-small --dataset MOLHIV \
  --model ogb_embed_sparse_cin --use_coboundaries True \
  --indrop_rate 0.0 --drop_rate 0.5 --graph_norm bn --drop_position lin2 \
  --nonlinearity relu --readout mean --final_readout sum \
  --lr 0.0001 --lr_scheduler None --num_layers 2 --emb_dim 48 \
  --batch_size 128 --epochs 150 --preproc_jobs 32 \
  --task_type bin_classification --eval_metric ogbg-molhiv \
  --max_dim 2 --max_ring_size 6 --init_method sum \
  --train_eval_period 10 --use_edge_features --dump_curves
