# Endurance-soak stage 1 (wogan): the full 002 real-world recipe —
# SwinIR-180 generator, two-stage Real-ESRGAN degradation chain, EMA,
# L1-only objective — at production model/batch dims, schedule scaled to
# 3k iterations on the procedural soak dataset. Feeds soak_002_gan via
# staged load_from exactly like the reference pair
# (/root/reference/configs/002_real_gan_...py:376).
exec(open('configs/002_real_wogan_localimplicitsr_swinir_df2k_g1_'
          'c64b16_1000k_unfold_lec_mulwkv.py').read())

exp_name = 'soak_002_wogan_synth_3k'
data = dict(data)
data['train'] = dict(data['train'])
data['train']['dataset'] = dict(data['train']['dataset'],
                                gt_folder='data/soak/HR')
data['val'] = dict(data['val'], gt_folder='data/soak/val_GT')
total_iters = 3000
lr_config = dict(policy='Step', by_epoch=False, step=[2000], gamma=0.5)
checkpoint_config = dict(interval=1000, save_optimizer=True,
                         by_epoch=False)
evaluation = dict(interval=1000, save_image=False)
log_config = dict(interval=50)
work_dir = f'./work_dirs/{exp_name}'
