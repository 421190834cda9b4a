from topotpu.cli.main import main

raise SystemExit(main())
