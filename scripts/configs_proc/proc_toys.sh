# Procedural acceptance scene (scripts/make_proc_scene.py) — the real-scene
# evidence run: 800x800, 100 train views, analytic GT with speculars + shadows.
name="proc_toys"
bound=1
scale=0.8
bg_radius=0
density_thresh=10
iters=8000
offset='0 0 0'
random_size=0
data_dir="./data_proc/proc_toys"
nerf_model="./results/${name}"
