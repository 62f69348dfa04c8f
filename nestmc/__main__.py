from nestmc.cli import main

raise SystemExit(main())
