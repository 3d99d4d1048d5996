"""Replay NeRF-simulator failure logs on the ground-truth simulator and build
confusion matrices.

Parity target: reference validation/utils/replay/replay_MC.py and
replay_CEM.py — parse the stress-test CSVs (noise columns 2:14 for MC,
3:15 for CEM), re-run each logged trajectory on BlenderSimulator, tally
step-level and trajectory-level TP/FP/TN/FN of NeRF-predicted vs ground-truth
collisions (persisting counts across runs in counts.pkl), and emit seaborn
confusion-matrix heatmaps (replay_MC.py:150-162).
"""

import csv
import os

import numpy as np
from scipy.stats import norm

from .simulators.blender_simulator import BlenderSimulator
from .utils.blender import runBlenderOnFailure
from .utils.files import load_counts, save_counts


def trajectoryLikelihood(noise, noise_mean, noise_std):
    lik = norm.pdf(np.asarray(noise), loc=np.asarray(noise_mean),
                   scale=np.asarray(noise_std))
    return np.log(lik).sum()


def _find_csv(results_dir="results"):
    files = os.listdir(results_dir)
    name = next((f for f in files if f.lower().endswith(".csv")), None)
    return os.path.join(results_dir, name) if name else None


def _replay_one(simulator, simulationSteps, simulationResult,
                simulationNumber, noise_mean, noise_std, blend_file,
                workspace, counts):
    """Replay one logged trajectory; update step counts in place."""
    (tp_s, tn_s, fp_s, fn_s) = counts
    simulator.reset()
    outputSimulationList = []
    simTrajLogLikelihood = 0.0
    everCollided = False
    step = 0
    for step, noise in enumerate(simulationSteps):
        isCollision, collisionVal, currentPos = simulator.step(noise)
        outputStepList = [simulationNumber, step]
        noiseList = np.asarray(noise)
        outputStepList.extend(noiseList)
        outputStepList.append(collisionVal)
        outputStepList.extend(np.asarray(currentPos))
        curLogLikelihood = trajectoryLikelihood(noiseList, noise_mean,
                                                noise_std)
        outputStepList.append(curLogLikelihood)
        simTrajLogLikelihood += curLogLikelihood
        outputStepList.append(simTrajLogLikelihood)
        outputStepList.append(isCollision)
        outputSimulationList.append(outputStepList)

        nerf_condition = simulationResult[step][0].upper() == "TRUE"
        tp_s += isCollision and nerf_condition
        fn_s += isCollision and not nerf_condition
        fp_s += (not isCollision) and nerf_condition
        tn_s += (not isCollision) and not nerf_condition

        if isCollision:
            everCollided = True
            remaining = len(simulationSteps) - step - 1
            runBlenderOnFailure(blend_file, workspace, simulationNumber,
                                step, outputSimulationList)
            fn_s += remaining
            break
    if not everCollided:
        runBlenderOnFailure(blend_file, workspace, simulationNumber, step,
                            outputSimulationList)

    os.makedirs("results/replays", exist_ok=True)
    with open("results/replays/collisionValuesReplay.csv", "a") as f:
        writer = csv.writer(f)
        for row in outputSimulationList:
            row.append(everCollided)
            writer.writerow(row)
    return (tp_s, tn_s, fp_s, fn_s), everCollided


def replay_MC(start_state, end_state, noise_mean, noise_std, agent_cfg,
              planner_cfg, camera_cfg, filter_cfg, get_rays_fn, render_fn,
              blender_cfg, density_fn, blend_file, workspace, seed,
              start_iter, camera=None, sdf=None, results_dir="results"):
    """replay_MC.py:17-141."""
    csv_file_path = _find_csv(results_dir)
    simulationData, simulationResult = {}, {}
    if csv_file_path:
        with open(csv_file_path) as f:
            for row in csv.reader(f):
                simulationNumber = int(row[0])
                noise_vector = np.array(row[2:14], dtype=np.float32)
                simulationData.setdefault(simulationNumber, []).append(
                    noise_vector)
                simulationResult.setdefault(simulationNumber, []).append(
                    [row[-2], row[-1]])

    if os.path.exists("results/replays/collisionValuesReplay.csv") \
            and start_iter == 0:
        os.remove("results/replays/collisionValuesReplay.csv")

    counts_filename = "counts.pkl"
    (tp_s, tn_s, fp_s, fn_s, tp_t, tn_t, fp_t, fn_t) = \
        load_counts(counts_filename)

    simulator = BlenderSimulator(start_state, end_state, agent_cfg,
                                 planner_cfg, camera_cfg, filter_cfg,
                                 get_rays_fn, render_fn, blender_cfg,
                                 density_fn, seed, camera=camera, sdf=sdf)
    print("Starting replay validation on BlenderSimulator")
    for simulationNumber in range(start_iter, len(simulationData)):
        steps = simulationData[simulationNumber]
        print(f"Replaying simulation {simulationNumber} with "
              f"{len(steps)} steps!")
        (tp_s, tn_s, fp_s, fn_s), everCollided = _replay_one(
            simulator, steps, simulationResult[simulationNumber],
            simulationNumber, noise_mean, noise_std, blend_file, workspace,
            (tp_s, tn_s, fp_s, fn_s))

        nerf_traj = simulationResult[simulationNumber][-1][1].upper() == "TRUE"
        tp_t += everCollided and nerf_traj
        fn_t += everCollided and not nerf_traj
        fp_t += (not everCollided) and nerf_traj
        tn_t += (not everCollided) and not nerf_traj

        save_counts([tp_s, tn_s, fp_s, fn_s, tp_t, tn_t, fp_t, fn_t],
                    counts_filename)

    createConfusionMatrix(tp_s, tn_s, fp_s, fn_s, "step")
    createConfusionMatrix(tp_t, tn_t, fp_t, fn_t, "traj")
    return [tp_s, tn_s, fp_s, fn_s, tp_t, tn_t, fp_t, fn_t]


def replay_CEM(start_state, end_state, noise_mean, noise_std, agent_cfg,
               planner_cfg, camera_cfg, filter_cfg, get_rays_fn, render_fn,
               blender_cfg, density_fn, blend_file, workspace, seed,
               start_iter, start_k, camera=None, sdf=None,
               results_dir="results"):
    """replay_CEM.py:17-169 (per-population nesting, noise cols 3:15)."""
    csv_file_path = _find_csv(results_dir)
    simulationData, simulationResult = {}, {}
    if csv_file_path:
        with open(csv_file_path) as f:
            for row in csv.reader(f):
                populationNumber = int(row[0])
                simulationNumber = int(row[1])
                noise_vector = np.array(row[3:15], dtype=np.float32)
                simulationData.setdefault(populationNumber, {}).setdefault(
                    simulationNumber, []).append(noise_vector)
                simulationResult.setdefault(populationNumber, {}).setdefault(
                    simulationNumber, []).append([row[-2], row[-1]])

    if os.path.exists("results/replays/collisionValuesReplay.csv") \
            and start_iter == 0:
        os.remove("results/replays/collisionValuesReplay.csv")

    counts_filename = "counts.pkl"
    (tp_s, tn_s, fp_s, fn_s, tp_t, tn_t, fp_t, fn_t) = \
        load_counts(counts_filename)

    simulator = BlenderSimulator(start_state, end_state, agent_cfg,
                                 planner_cfg, camera_cfg, filter_cfg,
                                 get_rays_fn, render_fn, blender_cfg,
                                 density_fn, seed, camera=camera, sdf=sdf)
    print("Starting replay validation on BlenderSimulator")
    for population in range(start_k, len(simulationData)):
        for simulationNumber in range(start_iter,
                                      len(simulationData[population])):
            steps = simulationData[population][simulationNumber]
            print(f"Replaying simulation {simulationNumber} with "
                  f"{len(steps)} steps in population {population}!")
            (tp_s, tn_s, fp_s, fn_s), everCollided = _replay_one(
                simulator, steps, simulationResult[population][simulationNumber],
                simulationNumber, noise_mean, noise_std, blend_file,
                workspace, (tp_s, tn_s, fp_s, fn_s))

            nerf_traj = simulationResult[population][simulationNumber][-1][1]\
                .upper() == "TRUE"
            tp_t += everCollided and nerf_traj
            fn_t += everCollided and not nerf_traj
            fp_t += (not everCollided) and nerf_traj
            tn_t += (not everCollided) and not nerf_traj
            save_counts([tp_s, tn_s, fp_s, fn_s, tp_t, tn_t, fp_t, fn_t],
                        counts_filename)

    createConfusionMatrix(tp_s, tn_s, fp_s, fn_s, "step")
    createConfusionMatrix(tp_t, tn_t, fp_t, fn_t, "traj")
    return [tp_s, tn_s, fp_s, fn_s, tp_t, tn_t, fp_t, fn_t]


def createConfusionMatrix(tp, tn, fp, fn, name, out_dir="results"):
    """replay_MC.py:150-162."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd
    try:
        import seaborn as sns
    except ImportError:
        sns = None
    plt.close("all")
    conf = np.array([[tn, fn], [fp, tp]])
    df = pd.DataFrame(conf, columns=["False", "True"],
                      index=["False", "True"])
    os.makedirs(out_dir, exist_ok=True)
    if sns is not None:
        sns.heatmap(df, annot=True, cmap="Blues", fmt="d")
    else:
        plt.imshow(conf, cmap="Blues")
    plt.xlabel("Blender Simulator Collision")
    plt.ylabel("NeRF Simulator Collision")
    plt.title(f"Confusion Matrix ({name})")
    plt.savefig(os.path.join(out_dir, f"confusion_matrix_{name}.png"))
    plt.close()
