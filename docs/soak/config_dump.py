# Endurance-soak recipe: the 001 CiaoSR-RDN DIV2K run at FULL production
# dims (C=64, 16 blocks, batch 16, patch 48, 2304 queries — identical model
# and per-step work to configs/001_..._rdn_...py), with the 1M-iteration
# schedule scaled x1/10: 100k iters, step-LR x0.5 at {20,40,60,80}k
# (reference /root/reference/configs/001_..._rdn_...py:156-166 scaled), and
# the REAL hook cadence kept: eval every 3k, checkpoint every 3k, log 100.
# Data: procedural learnable images (tools/make_synth_dataset.py) since
# the env has no DIV2K; the point is endurance + schedule + hooks, with a
# meaningful (decreasing) loss curve.
exp_name = 'soak_001_rdn_synth_100k'
scale_min, scale_max = 1, 4
val_scale = 4

model = dict(
    type='CiaoSR',
    generator=dict(
        type='LocalImplicitSRRDN',
        encoder=dict(
            type='RDN',
            in_channels=3,
            out_channels=3,
            mid_channels=64,
            num_blocks=16,
            upscale_factor=4,
            num_layers=8,
            channel_growth=64),
        imnet_q=dict(type='MLPRefiner', in_dim=4, out_dim=3,
                     hidden_list=[256, 256, 256, 256]),
        imnet_k=dict(type='MLPRefiner', in_dim=64, out_dim=64,
                     hidden_list=[256, 256, 256, 256]),
        imnet_v=dict(type='MLPRefiner', in_dim=64, out_dim=64,
                     hidden_list=[256, 256, 256, 256]),
        feat_unfold=True,
        eval_bsize=30000),
    rgb_mean=(0.4488, 0.4371, 0.4040),
    rgb_std=(1., 1., 1.),
    pixel_loss=dict(type='L1Loss', loss_weight=1.0, reduction='mean'))

train_cfg = None
test_cfg = dict(metrics=['PSNR', 'SSIM'], crop_border=val_scale,
                scale=val_scale, tile=192, tile_overlap=32,
                convert_to='y')

train_pipeline = [
    dict(type='LoadImageFromFile', io_backend='disk', key='gt',
         flag='color', channel_order='rgb'),
    dict(type='RandomDownSampling', scale_min=scale_min,
         scale_max=scale_max, patch_size=48),
    dict(type='RescaleToZeroOne', keys=['lq', 'gt']),
    dict(type='Flip', keys=['lq', 'gt'], flip_ratio=0.5,
         direction='horizontal'),
    dict(type='Flip', keys=['lq', 'gt'], flip_ratio=0.5,
         direction='vertical'),
    dict(type='RandomTransposeHW', keys=['lq', 'gt'], transpose_ratio=0.5),
    dict(type='ImageToTensor', keys=['lq', 'gt']),
    dict(type='GenerateCoordinateAndCell', sample_quantity=2304),
    dict(type='Collect', keys=['lq', 'gt', 'coord', 'cell'],
         meta_keys=['gt_path'])
]

valid_pipeline = [
    dict(type='LoadImageFromFile', io_backend='disk', key='gt',
         flag='color', channel_order='rgb'),
    dict(type='RandomDownSampling', scale_min=val_scale,
         scale_max=val_scale),
    dict(type='RescaleToZeroOne', keys=['lq', 'gt']),
    dict(type='ImageToTensor', keys=['lq', 'gt']),
    dict(type='GenerateCoordinateAndCell', scale=val_scale),
    dict(type='Collect', keys=['lq', 'gt', 'coord', 'cell'],
         meta_keys=['gt_path'])
]

data = dict(
    workers_per_gpu=8,
    train_dataloader=dict(samples_per_gpu=16, drop_last=True),
    val_dataloader=dict(samples_per_gpu=1),
    train=dict(
        type='RepeatDataset',
        times=20,
        dataset=dict(type='SRFolderGTDataset',
                     gt_folder='data/soak/HR',
                     pipeline=train_pipeline,
                     scale=scale_max)),
    val=dict(type='SRFolderGTDataset', gt_folder='data/soak/val_GT',
             pipeline=valid_pipeline, scale=val_scale))

optimizers = dict(type='Adam', lr=1.e-4)

total_iters = 100000
lr_config = dict(policy='Step', by_epoch=False,
                 step=[20000, 40000, 60000, 80000], gamma=0.5)

checkpoint_config = dict(interval=3000, save_optimizer=True, by_epoch=False)
evaluation = dict(interval=3000, save_image=False)
log_config = dict(interval=100)

work_dir = f'./work_dirs/{exp_name}'
