# Endurance-soak stage 2 (gan): the full 002 real-world GAN recipe —
# UNet-SN discriminator, VGG19 perceptual, vanilla GAN loss, sharpened-GT
# routing, EMA, disc gating, is_shuffle=False contiguous queries — at
# production model/batch dims, schedule scaled to 6k iterations, seeded
# from the stage-1 soak via load_from (reference staged-training flow).
exec(open('configs/002_real_gan_localimplicitsr_swinir_df2k_g1_'
          'c64b16_1000k_unfold_lec_mulwkv.py').read())

exp_name = 'soak_002_gan_synth_6k'
data = dict(data)
data['train'] = dict(data['train'])
data['train']['dataset'] = dict(data['train']['dataset'],
                                gt_folder='data/soak/HR')
data['val'] = dict(data['val'], gt_folder='data/soak/val_GT')
total_iters = 6000
lr_config = dict(policy='Step', by_epoch=False, step=[4000], gamma=0.5)
checkpoint_config = dict(interval=1000, save_optimizer=True,
                         by_epoch=False)
evaluation = dict(interval=1000, save_image=False)
log_config = dict(interval=50)
load_from = './work_dirs/soak_002_wogan_synth_3k'
work_dir = f'./work_dirs/{exp_name}'
