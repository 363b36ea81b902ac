from ncagg_spark.cli import main

raise SystemExit(main())
