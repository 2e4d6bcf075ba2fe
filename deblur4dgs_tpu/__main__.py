from deblur4dgs_tpu.cli import main

main()
