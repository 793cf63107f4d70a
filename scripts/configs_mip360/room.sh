bound=8
scale=0.33
density_thresh=10
iters=90000
min_near=0.2
data_dir=data/mip360/room
nerf_model=results/room
