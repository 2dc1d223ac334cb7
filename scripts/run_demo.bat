@echo off
rem Launcher parity with the reference's scripts/run.bat (the Windows
rem variant of run.sh: mvn package + hadoop fs staging + two
rem XmlExtractor jobs): run_demo.py performs the same stage -> pack ->
rem ExtractInventory -> ExtractBook -> cat sequence on Spark. Extra
rem args pass through (workdir, --streaming).
cd /d "%~dp0.."
set PYTHONPATH=.
python scripts\run_demo.py %*
