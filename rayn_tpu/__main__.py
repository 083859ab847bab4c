from rayn_tpu.cli import main

raise SystemExit(main())
