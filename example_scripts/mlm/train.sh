#!/bin/bash
# Retrieval-augmented MLM pretraining with retrieval-in-the-loop and scheduled
# in-place index refresh (role parity: reference example_scripts/mlm/train.sh).

DATA_DIR=${DATA_DIR:-./data}
SIZE=${SIZE:-base}
EXPERIMENT_NAME=${EXPERIMENT_NAME:-atlas-mlm-${SIZE}}

TRAIN_FILES="${DATA_DIR}/corpora/wiki/enwiki-dec2018/text-list-100-sec.jsonl"
PASSAGES="${DATA_DIR}/corpora/wiki/enwiki-dec2018/text-list-100-sec.jsonl ${DATA_DIR}/corpora/wiki/enwiki-dec2018/infobox.jsonl"

python train.py \
    --shuffle \
    --train_retriever \
    --gold_score_mode ppmean \
    --use_gradient_checkpoint_reader --use_gradient_checkpoint_retriever \
    --precision bf16 \
    --temperature_gold 0.01 --temperature_score 0.01 \
    --refresh_index 0-100:50,100-1000000:500 \
    --reader_model_type google/t5-${SIZE}-lm-adapt \
    --dropout 0.1 --weight_decay 0.01 \
    --lr 1e-4 --lr_retriever 1e-5 --scheduler cosine \
    --text_maxlength 384 \
    --train_data ${TRAIN_FILES} \
    --per_gpu_batch_size 2 \
    --n_context 20 --retriever_n_context 20 \
    --name ${EXPERIMENT_NAME} \
    --checkpoint_dir ./checkpoint \
    --eval_freq 5000 --log_freq 100 \
    --total_steps 10000 --warmup_steps 1000 --save_freq 5000 \
    --task mlm \
    --mlm_noise_density 0.15 --mlm_mean_noise_span_length 3 \
    --min_words_per_lm_instance 10 \
    --passages ${PASSAGES}
