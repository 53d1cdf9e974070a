#!/bin/bash
# VoSingle acoustic recipe
python train.py \
  --base_dir "$1" --format hubert_fisher \
  --CoVoMix_dim 80 --CoVoMix_dim_transformer 1024 --CoVoMix_depth 8 --CoVoMix_heads 16 \
  --CoVoMix_num_phoneme_tokens 502 --cond_drop_prob 0.3 \
  --batch_size 6 --lr 1e-4 --lr_scheduler --max_epochs 500 --dp 8
