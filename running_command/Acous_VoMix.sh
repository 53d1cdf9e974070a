#!/bin/bash
# VoMix acoustic recipe (2 speaker conds -> 1 mixed mel)
python train.py \
  --base_dir "$1" --format hubert_overlap_two_input_one_output --twocondition_oneoutput \
  --CoVoMix_dim 160 --CoVoMix_dim_transformer 1024 --CoVoMix_depth 8 --CoVoMix_heads 16 \
  --CoVoMix_num_phoneme_tokens 502 --cond_drop_prob 0.3 --random_mask \
  --batch_size 8 --lr 1e-4 --lr_scheduler --max_epochs 500 --dp 8
