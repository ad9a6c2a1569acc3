"""Task framework (reference: /root/reference/src/tasks/__init__.py:12-16)."""

from atlas_tpu.tasks import base, fever, kilt, lm, mlm, multiple_choice, qa, section

AVAILABLE_TASKS = {
    m.__name__.split(".")[-1]: m
    for m in [base, mlm, lm, multiple_choice, kilt, section, fever, qa]
}


def get_task(cfg, tokenizer):
    if cfg.task not in AVAILABLE_TASKS:
        raise ValueError(f"{cfg.task} not recognised")
    return AVAILABLE_TASKS[cfg.task].Task(cfg, tokenizer)
