#!/bin/bash
# Standalone-retriever mode: embed the Wikipedia 2018 corpus on the TPU mesh, save
# the index, run retrieval for NQ dev/test queries, and write retrieval jsonl —
# no reader, no training (role parity: reference example_scripts/nq/retrieve_only.sh).
#
# Retrieval results land in ./checkpoint/${EXPERIMENT_NAME}/, the index in
# .../saved_index (128 re-shardable shards, index/io.py).

DATA_DIR=${DATA_DIR:-./data}
SIZE=${SIZE:-xl}
EXPERIMENT_NAME=${EXPERIMENT_NAME:-atlas-nq-retrieve-only-${SIZE}}

# download + prepare, if not already present:
#   python preprocessing/prepare_qa.py --output_directory ${DATA_DIR}
#   python preprocessing/download_corpus.py --corpus corpora/wiki/enwiki-dec2018 --output_directory ${DATA_DIR}
#   python preprocessing/download_model.py --model models/atlas_nq/${SIZE} --output_directory ${DATA_DIR}

PASSAGES="${DATA_DIR}/corpora/wiki/enwiki-dec2018/text-list-100-sec.jsonl ${DATA_DIR}/corpora/wiki/enwiki-dec2018/infobox.jsonl"
EVAL_FILES="${DATA_DIR}/data/nq_data/dev.jsonl ${DATA_DIR}/data/nq_data/test.jsonl"
# NQ-finetuned retriever; set to "none" to retrieve with stock contriever weights
PRETRAINED_MODEL=${DATA_DIR}/models/atlas_nq/${SIZE}_tpu

python evaluate.py \
    --name ${EXPERIMENT_NAME} \
    --reader_model_type google/t5-${SIZE}-lm-adapt \
    --text_maxlength 512 \
    --model_path "${PRETRAINED_MODEL}" \
    --eval_data ${EVAL_FILES} \
    --n_context 40 --retriever_n_context 40 \
    --checkpoint_dir ./checkpoint \
    --index_mode flat \
    --task qa \
    --save_index_path ./checkpoint/${EXPERIMENT_NAME}/saved_index \
    --save_index_n_shards 128 \
    --write_results \
    --retrieve_only \
    --passages ${PASSAGES}
