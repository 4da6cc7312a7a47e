// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

/// @title Spectre — trust-minimized Ethereum light client
/// @notice Solidity source for the light-client state machine this repo
///         also emits as direct bytecode (spectre_tpu/evm/contracts.py —
///         the two must stay semantically identical; the bytecode build is
///         what the in-repo interpreter tests exercise, this source is the
///         forge-deployable artifact, mirroring the reference's
///         contracts submodule driven by justfile:45-53).
///
/// Storage layout is load-bearing (slots 0..7 match contracts.py):
///   0 head | 1 slotsPerPeriod | 2 finalityThreshold
///   3 stepVerifier | 4 updateVerifier
///   5 blockHeaderRoots | 6 executionPayloadRoots | 7 syncCommitteePoseidons
contract Spectre {
    uint256 public head;                       // slot 0
    uint256 public slotsPerPeriod;             // slot 1
    uint256 public finalityThreshold;          // slot 2
    address public stepVerifier;               // slot 3
    address public updateVerifier;             // slot 4
    mapping(uint256 => bytes32) public blockHeaderRoots;       // slot 5
    mapping(uint256 => bytes32) public executionPayloadRoots;  // slot 6
    mapping(uint256 => uint256) public syncCommitteePoseidons; // slot 7

    struct StepInput {
        uint64 attestedSlot;
        uint64 finalizedSlot;
        uint64 participation;
        bytes32 finalizedHeaderRoot;
        bytes32 executionPayloadRoot;
    }

    constructor(
        address _stepVerifier,
        address _updateVerifier,
        uint256 _initialSyncPeriod,
        uint256 _initialPoseidon,
        uint256 _slotsPerPeriod,
        uint256 _finalityThreshold
    ) {
        stepVerifier = _stepVerifier;
        updateVerifier = _updateVerifier;
        slotsPerPeriod = _slotsPerPeriod;
        finalityThreshold = _finalityThreshold;
        syncCommitteePoseidons[_initialSyncPeriod] = _initialPoseidon;
    }

    /// @notice Advance the head with a proven sync-step.
    /// @dev Recomputes the SHA-256 public-input commitment on-chain
    ///      (StepExternal.toPublicInputsCommitment equivalence, tested at
    ///      step_input_encoding.rs:55-78 in the reference), looks up the
    ///      period's committee poseidon, and calls the step verifier over
    ///      [instances ‖ proof] calldata.
    function step(StepInput calldata input, bytes calldata proof) external {
        require(input.participation >= finalityThreshold, "!finality");
        uint256 period = input.attestedSlot / slotsPerPeriod;
        uint256 poseidon = syncCommitteePoseidons[period];
        require(poseidon != 0, "!poseidon");

        uint256 commitment = toPublicInputsCommitment(input);
        bytes memory cd = abi.encodePacked(
            bytes32(commitment), bytes32(poseidon), proof);
        (bool ok, ) = stepVerifier.staticcall(cd);
        require(ok, "!proof");

        if (input.finalizedSlot > head) {
            head = input.finalizedSlot;
        }
        blockHeaderRoots[input.finalizedSlot] = input.finalizedHeaderRoot;
        executionPayloadRoots[input.finalizedSlot] =
            input.executionPayloadRoot;
    }

    /// @notice Rotate in the next committee's poseidon commitment.
    /// @dev The committee-update instance layout is
    ///      [poseidon, root_lo(u128), root_hi(u128)]; the finalized header
    ///      root must have been recorded by a prior step.
    function rotate(
        uint64 finalizedSlot,
        uint256 nextPoseidon,
        bytes calldata proof
    ) external {
        bytes32 root = blockHeaderRoots[finalizedSlot];
        require(root != bytes32(0), "!header");
        uint256 rootLo = uint256(root) & type(uint128).max;
        uint256 rootHi = uint256(root) >> 128;
        bytes memory cd = abi.encodePacked(
            bytes32(nextPoseidon), bytes32(rootLo), bytes32(rootHi), proof);
        (bool ok, ) = updateVerifier.staticcall(cd);
        require(ok, "!proof");
        uint256 nextPeriod = finalizedSlot / slotsPerPeriod + 1;
        syncCommitteePoseidons[nextPeriod] = nextPoseidon;
    }

    /// @notice SHA-256 commitment over the step public inputs, truncated
    ///         to 253 bits (sync_step_circuit.rs:368-388 analog):
    ///         sha256(LE(attestedSlot) ‖ LE(finalizedSlot) ‖
    ///                LE(participation) ‖ finalizedHeaderRoot ‖
    ///                executionPayloadRoot), little-endian interpreted.
    function toPublicInputsCommitment(StepInput calldata input)
        public pure returns (uint256)
    {
        bytes32 digest = sha256(abi.encodePacked(
            _le64(input.attestedSlot),
            _le64(input.finalizedSlot),
            _le64(input.participation),
            input.finalizedHeaderRoot,
            input.executionPayloadRoot));
        return _leUint(digest) & ((uint256(1) << 253) - 1);
    }

    function _le64(uint64 v) private pure returns (bytes8 out) {
        for (uint256 i = 0; i < 8; i++) {
            out |= bytes8(bytes1(uint8(v >> (8 * i)))) >> (8 * i);
        }
    }

    function _leUint(bytes32 b) private pure returns (uint256 acc) {
        for (uint256 i = 0; i < 32; i++) {
            acc |= uint256(uint8(b[i])) << (8 * i);
        }
    }
}
