#!/bin/bash
# CoMix dual-stream text2semantic recipe
python train.py \
  --base_dir "$1" --format text2semantic_2output --text2semantic --text2semantic_two_output \
  --bert_vocab "${BERT_VOCAB:?set BERT_VOCAB to bert-base-uncased vocab.txt}" \
  --CoVoMix_dim_transformer 512 --target_transformer_dim 1024 --text2semantic_tokens 501 \
  --text2semantic_source_depth 4 --text2semantic_target_depth 4 --text2semantic_head 8 \
  --batch_size 6 --lr 1e-4 --lr_scheduler --max_epochs 500 --dp 8
