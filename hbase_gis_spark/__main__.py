from hbase_gis_spark.cli import main

raise SystemExit(main())
