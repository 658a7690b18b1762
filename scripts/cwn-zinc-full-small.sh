#!/bin/bash
# Parity config: /root/reference/exp/scripts/cwn-zinc-full-small.sh
python -m cwn_tpu.exp.run_mol \
  --start_seed 0 --stop_seed 3 --exp_name cwn-zinc-full-small --dataset ZINC-FULL \
  --train_eval_period 25 --epochs 150 --batch_size 128 \
  --drop_rate 0.0 --drop_position lin2 --emb_dim 48 --max_dim 2 \
  --final_readout sum --init_method sum --lr 0.001 --graph_norm bn \
  --model embed_sparse_cin --nonlinearity relu --num_layers 2 \
  --readout sum --max_ring_size 18 \
  --task_type regression --eval_metric mae --minimize \
  --lr_scheduler ReduceLROnPlateau --use_coboundaries True \
  --use_edge_features --early_stop --lr_scheduler_patience 5 \
  --dump_curves --preproc_jobs 32
