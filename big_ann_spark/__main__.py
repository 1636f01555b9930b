from big_ann_spark.cli import main

raise SystemExit(main())
