bound=4
scale=0.33
density_thresh=10
iters=10000
min_near=0.2
data_dir=data/llff/fern
nerf_model=results/fern
