# 822M InternLM on a single v5e chip (16GB HBM): the largest dense config that
# fits with full AdamW state; full activation remat. This is the bench.py
# "700m" preset as a runnable training config.
JOB_NAME = "700m_v5e"

SEQ_LEN = 2048
HIDDEN_SIZE = 2048
NUM_ATTENTION_HEAD = 16
MLP_RATIO = 8 / 3
NUM_LAYER = 12
VOCAB_SIZE = 50304

ckpt = dict(
    enable_save_ckpt=False,
    save_ckpt_folder="local:llm_ckpts_700m",
    auto_resume=True,
    checkpoint_every=500,
    async_upload=False,
    oss_snapshot_freq=0,
)

data = dict(
    seq_len=SEQ_LEN,
    micro_num=2,
    micro_bsz=2,
    valid_every=0,
    pack_sample_into_one=False,
    total_steps=50000,
    skip_batches="",
    rampup_batch_size="",
    min_length=50,
    train_folder=None,  # set to your tokenized dataset folder
    valid_folder=None,
    empty_cache_and_diag_interval=500,
)

grad_scaler = dict(
    fp16=dict(initial_scale=2**16, min_scale=1, growth_interval=1000),
    growth_factor=2, backoff_factor=0.5, max_scale=2**24, hysteresis=2,
)

hybrid_zero_optimizer = dict(
    overlap_sync_grad=True, overlap_sync_param=False,
    reduce_bucket_size=512 * 1024 * 1024, clip_grad_norm=1.0,
)

loss = dict(label_smoothing=0)

adam = dict(lr=3e-4, adam_beta1=0.9, adam_beta2=0.95, adam_beta2_c=0,
            adam_eps=1e-8, weight_decay=0.01)

lr_scheduler = dict(total_steps=data["total_steps"], init_steps=0,
                    warmup_ratio=0.01, eta_min=1e-5)

beta2_scheduler = dict(init_beta2=adam["adam_beta2"], c=adam["adam_beta2_c"])

model = dict(
    checkpoint=1.0,  # full remat: optimizer state leaves ~4GB for activations
    num_attention_heads=NUM_ATTENTION_HEAD,
    vocab_size=VOCAB_SIZE,
    embed_grad_scale=1,
    parallel_output=True,
    hidden_size=HIDDEN_SIZE,
    num_layers=NUM_LAYER,
    mlp_ratio=MLP_RATIO,
    dtype="torch.bfloat16",
    norm_type="rmsnorm",
    layer_norm_epsilon=1e-5,
)

parallel = dict(
    zero1=dict(size=-1),
    tensor=dict(size=1, mode="mtp"),
    pipeline=dict(size=1, interleaved_overlap=True),
    weight=dict(size=1, overlap=True, memory_pool=True),
)

monitor = dict(alert=dict(enable_feishu_alert=False, feishu_alert_address=None))
