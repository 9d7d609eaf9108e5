from icm_slam_tpu.cli import main

main()
