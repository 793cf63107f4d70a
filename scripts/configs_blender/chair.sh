bound=1
scale=0.8
density_thresh=10
iters=30000
min_near=0.2
data_dir=data/nerf_synthetic/chair
nerf_model=results/chair
