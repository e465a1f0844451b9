package graft.compendium

/** QC thresholds and operating parameters (config_template.py:14-76).
  * Defaults mirror the reference's template values (BASELINE.md).
  */
final case class QcThresholds(
    // sample-level, config_template.py:42-53
    retainedWarn: Double = 0.69,   // warn below
    retainedError: Double = 0.59,  // error below
    chimeraWarn: Double = 0.10,    // warn above
    chimeraError: Double = 0.20,   // error above
    mergedWarn: Double = 0.80,     // warn below
    mergedError: Double = 0.65,    // error below
    // project-level fractions, config_template.py:69-76
    projectRetainedWarn: Double = 0.70,
    projectRetainedError: Double = 0.20,
    projectMergedWarn: Double = 0.4,
    projectMergedError: Double = 0.15,
    projectChimeraWarn: Double = 0.4,
    projectChimeraError: Double = 0.2)

final case class EngineConfig(
    thresholds: QcThresholds = QcThresholds(),
    maxProjects: Int = 8,            // config_template.py:17
    minProjectSamples: Long = 50,    // management.py:90
    maxProjectSamples: Long = 10000,
    eutilsBatchSize: Int = 80,       // db.py:266
    eutilsThrottleMs: Long = 500,    // db.py:321
    eutilsUrlMaxChars: Int = 1950,   // db.py:314
    eutilsTimeoutSec: Int = 25,      // config_template.py:30
    taxonomyDatabase: String = "silva_nr99_v138_train_set") // projects.py:517

object EngineConfig { val default: EngineConfig = EngineConfig() }
