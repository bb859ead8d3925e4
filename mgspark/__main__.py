from mgspark.cli import main

main()
