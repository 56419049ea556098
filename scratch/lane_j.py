import sys; sys.path.insert(0, "/root/repo")
from experiments.fleet import run_job
# r=2.25 polish retry: the 500-epoch fit left the model 38 mHa off the
# singlet target and VMC then locked onto the S^2=12 excited eigenstate
# (var -> 1e-4). Refit much harder (3000 epochs) from the trained state,
# then polish.
job = {"name": "n2_2.25", "molecule": "N2_2.25", "env": {},
       "args": ["-m", "N2_2.25", "-n_train", "4600", "-s", "11",
                "-n_hid", "64", "-n_layer", "1", "-n_hid_phase", "512",
                "-n_layer_phase", "2", "-single_phase", "-save_freq", "500",
                "-loadH", "-n_samps", "1e7", "-n_unq_samps_min", "256",
                "-n_unq_samps_max", "4096", "-exact_sampling",
                "-ws_solve_h", "2900", "-ws_epochs", "3000"]}
run_job(job, stall_secs=900)
