"""Monte-Carlo stress test.

Parity target: reference validation/stresstests/MonteCarlo.py — n_simulations
rollouts of `steps` disturbances with reward-adapted noise std
(adjusted = std + 0.01*std*reward, :49-52), per-step Gaussian log-likelihood
(:29-35), CSV logging with the documented column schema (:95-116), Blender
failure visualization on collision (:88-93), resumable via start_iter.
"""

import csv
import os

import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import norm

from ..utils.blender import runBlenderOnFailure


class MonteCarlo:
    collisions = 0
    stepsToCollision = 0

    def __init__(self, simulator, n_simulations, steps, noise_mean, noise_std,
                 blend_file, workspace, start_iter, noise_seed: int = 0):
        self.simulator = simulator
        self.n_simulations = n_simulations
        self.noise_mean = jnp.asarray(noise_mean, dtype=jnp.float32)
        self.noise_std = jnp.asarray(noise_std, dtype=jnp.float32)
        self.noise_mean_cpu = np.asarray(noise_mean, dtype=np.float32)
        self.noise_std_cpu = np.asarray(noise_std, dtype=np.float32)
        self.steps = steps
        self.blend_file = blend_file
        self.workspace = workspace
        self.start_iter = start_iter
        self.key = jax.random.PRNGKey(noise_seed)

    def trajectoryLikelihood(self, noise):
        """Sum of per-element log N(noise; mean, std) (MonteCarlo.py:29-35)."""
        lik = norm.pdf(np.asarray(noise), loc=self.noise_mean_cpu,
                       scale=self.noise_std_cpu)
        lik = np.clip(lik, 1e-8, 1e8)
        return np.log(lik).sum()

    def validate(self):
        """MonteCarlo.py:37-121; full-fidelity sequential loop."""
        is_nerf = hasattr(self.simulator, "uq_method")
        for simulationNumber in range(self.start_iter, self.n_simulations):
            self.simulator.reset()
            outputSimulationList = []
            everCollided = False
            simTrajLogLikelihood = 0.0
            reward = 0.0
            noise_std = self.noise_std

            print(f"Starting simulation {simulationNumber}")
            for stepNumber in range(self.steps):
                # reward-adapted noise std (MonteCarlo.py:49-52)
                adjusted_noise_std = noise_std + reward * (0.01 * noise_std)
                self.key, sub = jax.random.split(self.key)
                noise = self.noise_mean + adjusted_noise_std * \
                    jax.random.normal(sub, self.noise_mean.shape)

                result = self.simulator.step(noise)
                if is_nerf:
                    isCollision, collisionVal, currentPos, sigma_d_opt, trace = result
                else:
                    isCollision, collisionVal, currentPos = result

                outputStepList = [simulationNumber, stepNumber]
                noiseList = np.asarray(noise)
                outputStepList.extend(noiseList)
                outputStepList.append(collisionVal)
                outputStepList.extend(np.asarray(currentPos))

                curLogLikelihood = self.trajectoryLikelihood(noiseList)
                outputStepList.append(curLogLikelihood)
                simTrajLogLikelihood += curLogLikelihood
                outputStepList.append(simTrajLogLikelihood)

                if is_nerf:
                    outputStepList.append(reward)
                    outputStepList.append(sigma_d_opt)
                    reward = self.simulator.reward(curLogLikelihood,
                                                   sigma_d_opt, trace)

                outputStepList.append(isCollision)
                outputSimulationList.append(outputStepList)

                if isCollision:
                    self.collisions += 1
                    self.stepsToCollision += stepNumber
                    everCollided = True
                    runBlenderOnFailure(self.blend_file, self.workspace,
                                        simulationNumber, stepNumber,
                                        outputSimulationList)
                    break

            os.makedirs("./results", exist_ok=True)
            # CSV schema documented at MonteCarlo.py:95-110
            with open(f"./results/collisionValuesBlenderMC_"
                      f"n{self.n_simulations}.csv", "a") as csvFile:
                writer = csv.writer(csvFile)
                for outputStepList in outputSimulationList:
                    outputStepList.append(everCollided)
                    writer.writerow(outputStepList)

        if self.collisions > 0:
            print(f"\n\t{self.collisions} collisions in "
                  f"{self.n_simulations} simulations, for a crash % of "
                  f"{100 * self.collisions / self.n_simulations}%\n")
            print(f"\tAverage step at collision: "
                  f"{self.stepsToCollision / self.collisions}\n")
