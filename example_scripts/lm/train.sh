#!/bin/bash
# Prefix language modelling on Wikipedia 2018 with retrieval-in-the-loop
# (role parity: reference example_scripts/lm/train.sh). The training data doubles
# as the retrieval corpus; the index refreshes every 1000 steps while the
# retriever trains with over-retrieve + rerank.

DATA_DIR=${DATA_DIR:-./data}
SIZE=${SIZE:-xl}
EXPERIMENT_NAME=${EXPERIMENT_NAME:-atlas-wiki-lm-${SIZE}}

# download + split, if not already present:
#   python preprocessing/download_corpus.py --corpus corpora/wiki/enwiki-dec2018 --output_directory ${DATA_DIR}
TEXTS="${DATA_DIR}/corpora/wiki/enwiki-dec2018/text-list-100-sec.jsonl"
INFOBOXES="${DATA_DIR}/corpora/wiki/enwiki-dec2018/infobox.jsonl"
for f in "${TEXTS}" "${INFOBOXES}"; do
    if [ ! -f "${f}.shuf.train" ]; then
        shuf "${f}" > "${f}.shuf"
        head -n 1000 "${f}.shuf" > "${f}.shuf.test"
        head -n 2000 "${f}.shuf" | tail -n 1000 > "${f}.shuf.valid"
        tail -n +2001 "${f}.shuf" > "${f}.shuf.train"
    fi
done

TRAIN_FILES="${TEXTS}.shuf.train ${INFOBOXES}.shuf.train"
EVAL_FILES="${TEXTS}.shuf.valid ${INFOBOXES}.shuf.valid"

python train.py \
    --retrieve_with_rerank --n_to_rerank_with_retrieve_with_rerank 100 \
    --train_retriever --gold_score_mode pdist \
    --use_gradient_checkpoint_reader --use_gradient_checkpoint_retriever \
    --shard_grads --shard_optim \
    --precision bf16 \
    --temperature_gold 0.01 --temperature_score 0.01 \
    --refresh_index 1000 \
    --reader_model_type google/t5-${SIZE}-lm-adapt \
    --passages ${TRAIN_FILES} \
    --target_maxlength 64 \
    --dropout 0.1 --weight_decay 0.01 \
    --lr 1e-4 --lr_retriever 1e-5 --scheduler linear \
    --text_maxlength 384 \
    --model_path none \
    --train_data ${TRAIN_FILES} --eval_data ${EVAL_FILES} \
    --per_gpu_batch_size 2 \
    --n_context 20 --retriever_n_context 20 \
    --name ${EXPERIMENT_NAME} \
    --checkpoint_dir ./checkpoint \
    --save_freq 5000 --eval_freq 1000 --log_freq 100 \
    --total_steps 10000 --warmup_steps 1000 \
    --min_words_per_lm_instance 10 \
    --task lm \
    --min_lm_context_ratio 0.25 --max_lm_context_ratio 0.75
