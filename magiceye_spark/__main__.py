from magiceye_spark.cli import main

raise SystemExit(main())
