name="fern"
bound=2
scale=0.02
bg_radius=0
density_thresh=10
iters=10000
offset='0 0 1.5'
dt_gamma=0
min_near=0.2
data_dir="./data/llff/${name}"
workspace="./llff/${name}"

