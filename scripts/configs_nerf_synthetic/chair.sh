name="chair"
bound=1
scale=0.8
bg_radius=0
density_thresh=10
iters=30000
offset='0 0 0'
dt_gamma=0
min_near=0.2
data_dir="./data/nerf_synthetic/${name}"
workspace="./nerf_synthetic/${name}"

